"""Physical-plan inspection utilities — scale hygiene as executable tests."""

from .audit import (  # noqa: F401
    assert_no_exchange,
    assert_pushed_filter,
    count_exchanges,
    has_broadcast_join,
    physical_plan,
    python_eval_nodes,
    wholestage_codegen_spans,
)
