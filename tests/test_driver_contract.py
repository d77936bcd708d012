"""Driver-contract consistency: the 50-slot window ordering, oracle
alignment, and registration invariants of __spark_entry__."""

import __spark_entry__ as E


def test_priority_names_all_registered():
    """A renamed query must not silently fall out of the driver window
    (the reorder filters with `if n in q`)."""
    q = E.queries()
    missing = [n for n in E._DRIVER_WINDOW_PRIORITY if n not in q]
    assert missing == []


def test_registration_order_front_loads_priority_and_ends_with_rows_only():
    names = list(E.queries())
    k = len(E._DRIVER_WINDOW_PRIORITY)
    assert names[:k] == list(E._DRIVER_WINDOW_PRIORITY)
    # the guaranteed-no-oracle query must never burn a window slot
    assert names[-1] == "compression_by_codec"
    assert len(set(names)) == len(names)


def test_oracle_alignment():
    q = E.queries()
    o = E.oracle_sql()
    # every oracle refers to a registered query
    assert set(o) - set(q) == set()
    # rows-only queries are exactly the documented set
    assert set(q) - set(o) == {"compression_by_codec"}


def test_window_holds_at_least_50_gated_queries():
    names = list(E.queries())
    o = E.oracle_sql()
    assert all(n in o for n in names[:50])
