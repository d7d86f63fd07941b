"""Registry-order policy guard (docs/ROUND5.md §1).

The driver's CORRECTNESS_r{N}.json verifies only the FIRST 50 keys of
``queries()`` in iteration order (verified against the round-4 artifact:
exact prefix match). Registry order is therefore a coverage decision;
these tests keep it deliberate instead of accidental.
"""

import glob
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVER_WINDOW = 50


def _registry_keys():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entrymod_window", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return list(mod.queries().keys()), set(mod.oracle_sql().keys())


def _prior_green_keys():
    green = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        with open(path) as fh:
            art = json.load(fh)
        for name, row in art.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("err") is None
            ):
                green.add(name)
    return green


def test_every_key_window_covered_or_previously_green():
    """A key outside the first-50 window must already have a driver-green
    row in some prior round's artifact — otherwise it would silently
    never be officially verified (the round-4 defect)."""
    keys, _ = _registry_keys()
    prior = _prior_green_keys()
    uncovered = [k for k in keys[DRIVER_WINDOW:] if k not in prior]
    assert not uncovered, (
        "registry keys outside the driver's first-50 window with no prior "
        f"driver-green CORRECTNESS row: {uncovered}; move them into the "
        "window (docs/ROUND5.md §1)"
    )


def test_round4_tail_is_inside_window():
    """The 18 keys that fell out of the round-4 window must sit inside the
    round-5 window so CORRECTNESS_r05 finally records them."""
    keys, _ = _registry_keys()
    window = set(keys[:DRIVER_WINDOW])
    tail18 = {
        "dedup_minhash_lsh", "dedup_incremental", "dedup_components",
        "dedup_simhash", "sim_cosine_topk", "sim_near_dup", "tpch_q1",
        "tpch_q3ish", "rollup_by_host", "set_ops_users",
        "distinct_urls_per_host", "events_hourly", "events_sessionize",
        "sim_ann_lsh", "sim_ann_ivf", "sim_near_dup_lsh",
        "mm_image_features", "mm_frame_sample",
    }
    missing = tail18 - window
    assert not missing, f"round-4 tail keys outside the r05 window: {missing}"


def test_union_of_rounds_covers_registry():
    keys, _ = _registry_keys()
    covered = _prior_green_keys() | set(keys[:DRIVER_WINDOW])
    assert covered >= set(keys), set(keys) - covered


def test_queries_and_oracles_key_sets_match():
    keys, oracle_keys = _registry_keys()
    assert set(keys) == oracle_keys
    assert len(keys) == len(set(keys))
