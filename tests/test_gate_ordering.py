"""Pin the driver-gate ordering invariant (r3 VERDICT item 2 / ADVICE).

The driver records only the first ~50 entries of ``queries()`` in
CORRECTNESS_r{N}.json.  ``__ray_entry__`` therefore orders the dict so
the recorded window is 100% SQL-oracled (with q_line_dedup inside it)
and demotes overflow oracled queries to ``_ORACLED_TAIL`` — each of
which must still register SQL (and carries its own DuckDB-parity
pytest elsewhere).  This file turns those hand-maintained rules into a
regression test: the exact failure mode it guards (a queries() insert
silently pushing oracled queries out of the recorded window,
un-certifying a whole suite) happened in round 2.
"""
import os
import sys

RECORD_WINDOW = 50

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as E  # noqa: E402


def _names_and_oracled():
    q = list(E.queries())
    oracled = set(E._oracle_sql(ensure=False))
    return q, oracled


def test_recorded_window_is_fully_oracled():
    q, oracled = _names_and_oracled()
    head = q[:RECORD_WINDOW]
    not_oracled = [n for n in head if n not in oracled]
    assert not_oracled == [], (
        f"rows-only queries inside the driver's {RECORD_WINDOW}-slot "
        f"recording window: {not_oracled}")


def test_line_dedup_inside_recorded_window():
    q, _ = _names_and_oracled()
    assert "q_line_dedup" in q[:RECORD_WINDOW]


def test_oracled_tail_entries_register_sql_and_queries():
    q, oracled = _names_and_oracled()
    missing_sql = [n for n in E._ORACLED_TAIL if n not in oracled]
    missing_query = [n for n in E._ORACLED_TAIL if n not in q]
    assert missing_sql == [], f"_ORACLED_TAIL without SQL: {missing_sql}"
    assert missing_query == [], (
        f"_ORACLED_TAIL not registered in queries(): {missing_query}")


def test_no_oracled_query_outside_window_except_tail():
    """Every SQL-oracled query is either in the recorded window or an
    explicit (documented) _ORACLED_TAIL demotion — never silently past
    the window."""
    q, oracled = _names_and_oracled()
    tail = set(E._ORACLED_TAIL)
    stranded = [n for n in q[RECORD_WINDOW:]
                if n in oracled and n not in tail]
    assert stranded == [], (
        f"oracled queries past slot {RECORD_WINDOW} without an "
        f"_ORACLED_TAIL demotion entry: {stranded}")


def test_every_oracle_sql_key_has_a_query():
    q, oracled = _names_and_oracled()
    orphans = sorted(oracled - set(q))
    assert orphans == [], f"oracle_sql() keys with no queries() entry: {orphans}"
