"""Driver-gate rotation discipline (the round-3/round-4 process miss).

The round driver records hard CORRECTNESS rows for the FIRST 50 registry
entries only. A query registered without being placed inside that window
never earns a hard driver row — twice now a batch of new queries shipped
outside it. This test makes that a FAILURE, not a judge finding: every
registry entry that has no driver-green row in any CORRECTNESS_r*.json on
disk must sit inside the first 50 positions of ALL_QUERIES.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.rotation import GATE_SLOTS, green_rows  # noqa: E402

from brink_spark.queries import ALL_QUERIES  # noqa: E402


def test_never_checked_queries_sit_inside_the_driver_gate():
    last = green_rows()
    names = list(ALL_QUERIES)
    never = [n for n in names if n not in last]
    outside = [n for n in never if names.index(n) >= GATE_SLOTS]
    assert not outside, (
        f"queries with no driver CORRECTNESS row from any round are "
        f"ordered past the {GATE_SLOTS}-slot driver gate and will stay "
        f"hard-signal-untested: {outside} — reorder _DRIVER_GATE_ORDER "
        f"(tools/rotation.py prints the recommended order)"
    )


def test_gate_order_names_all_resolve():
    # a typo in _DRIVER_GATE_ORDER would KeyError at import; belt and
    # braces: the merged registry and the ordered view agree exactly
    from brink_spark.queries import _DRIVER_GATE_ORDER, _MERGED

    assert set(_DRIVER_GATE_ORDER) <= set(_MERGED)
    assert set(ALL_QUERIES) == set(_MERGED)
    assert len(ALL_QUERIES) == len(_MERGED)
