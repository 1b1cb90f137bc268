"""Registry-shape invariants: every driver-facing entry is well-formed
before the driver ever sees it."""

from mcp_local_rag_spark.queries import oracle_sql, queries


def test_registry_shape():
    qs = queries()
    osql = oracle_sql()
    assert len(qs) >= 100
    # every oracle belongs to a registered query
    assert set(osql) <= set(qs)
    # at most the documented handful of rows-only entries
    no_oracle = set(qs) - set(osql)
    assert no_oracle == {"chunk_documents_uax29"}
    # rows-only entries sort LAST: the driver's 50-query sample window
    # must land only on hash-checkable (oracle-paired) queries
    names = list(qs)
    assert names[-len(no_oracle):] == sorted(no_oracle)
    for name, sql in osql.items():
        assert isinstance(sql, str) and sql.strip(), name
        assert "SELECT" in sql.upper(), name
    for name, fn in qs.items():
        assert callable(fn), name


def test_registry_order_puts_unverified_first():
    """The driver checks a 50-query window from the head: never-verified
    oracle-paired entries must sort before previously-green ones (and
    rows-only entries sort after everything)."""
    # derive the verified union from the module so a new round's fold
    # can never silently stale this test (r15: the R13/R14 fold landed
    # while this import list stopped at R12)
    import mcp_local_rag_spark.queries as qmod

    seen = set()
    for attr in dir(qmod):
        if attr.startswith("_VERIFIED_R"):
            seen |= getattr(qmod, attr)
    names = list(queries())
    paired = set(oracle_sql())
    first_seen_idx = min(i for i, n in enumerate(names) if n in seen)
    last_new_idx = max(
        (
            i
            for i, n in enumerate(names)
            if n not in seen and n in paired
        ),
        default=-1,
    )
    assert last_new_idx < 50  # every new query is inside the check window
    if last_new_idx >= 0:  # when new queries exist, they precede the old
        assert first_seen_idx > 0
