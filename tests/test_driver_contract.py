"""Driver-contract invariants that need no Spark session."""


def test_queries_and_oracles_key_aligned():
    """Every queries() entry must have an oracle_sql() twin and vice versa
    — the correctness gate silently skips orphans, so drift here would
    demote a query to untested without any failure signal."""
    import __spark_entry__ as E

    q = set(E.queries())
    o = set(E.oracle_sql())
    assert q == o, (sorted(q - o), sorted(o - q))


def test_oracles_are_nonempty_sql():
    import re

    import __spark_entry__ as E

    for name, sql in E.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
        # catch unformatted f-string placeholders like {threshold} while
        # allowing regex quantifier braces like {1,3} / {2,} in patterns
        leftover = re.search(r"\{[A-Za-z_][A-Za-z_0-9]*\}", sql)
        assert not leftover, (
            f"{name}: unformatted placeholder {leftover and leftover.group()}"
        )
