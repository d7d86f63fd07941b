"""bench.py is the driver's per-round measurement contract — guard that
it runs end-to-end and emits exactly ONE valid JSON line with the
promised fields (a broken bench silently costs a round's BENCH record)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_emits_one_json_line(tmp_path):
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=os.path.join(
            os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"), "sf0.001"
        ),
        SPARK_GRAFT_CPUS="8",
        SPARK_GRAFT_BENCH_REPS="1",
        SPARK_GRAFT_BENCH_CACHE=str(tmp_path / "cache"),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=1200,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [
        ln for ln in out.stdout.replace("\r", "\n").splitlines()
        if ln.startswith('{"metric"')
    ]
    assert len(lines) == 1, out.stdout[-2000:]
    d = json.loads(lines[0])
    assert d["metric"] == "headline_queries_total_sec"
    assert d["unit"] == "sec" and d["value"] > 0
    assert d["queries"] and all(v >= 0 for v in d["queries"].values())
    # the round-4 window-quality calibration must be present and sane
    assert d["kernel_ceiling_urls_per_sec"] > 0
    assert d["kernel_ceiling_pages"] > 0
    assert d["crawl_round_urls_per_sec"] > 0
    assert d["extract_urls_per_sec"] > 0
    # drift triage (round-4 verdict #4): field always present; checks
    # only fire when a prior round's bench exists at the SAME sf (none
    # at sf0.001, so this run must record an empty dict)
    assert d["drift_checks"] == {}


def test_previous_round_queries_sf_gated():
    """The drift baseline comes from the NEWEST BENCH_r{N}.json at the
    same sf; a different sf yields no baseline (no cross-sf drift
    noise)."""
    sys.path.insert(0, REPO)
    import bench

    prev = bench._previous_round_queries(0.1)
    assert prev and all(isinstance(v, float) for v in prev.values())
    assert bench._previous_round_queries(123.0) == {}
