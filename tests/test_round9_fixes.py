"""Round-9 regression tests: the VERDICT r8 / ADVICE r8 fixes.

1. Registry uniqueness — `_q` raises on duplicate names (r8 shipped two
   silently-shadowed dead definitions), and decorator count == live count.
"""

from __future__ import annotations

import re

import pytest


def test_q_raises_on_duplicate_registration():
    from flink_cdc_dsql_master_spark.queries import QUERIES, _q

    name = next(iter(QUERIES))
    with pytest.raises(ValueError, match="duplicate query registration"):
        _q(name)(lambda spark, sf_dir: None)
    # the failed registration must not have clobbered the original
    assert QUERIES[name] is not None


def test_decorator_count_equals_live_registry():
    import flink_cdc_dsql_master_spark.queries as q

    src = open(q.__file__).read()
    decorators = len(re.findall(r"@_q\(", src))
    assert decorators == len(q.QUERIES), (
        f"{decorators} @_q decorators but {len(q.QUERIES)} live queries: "
        "a duplicate name is shadowing an earlier definition")
