"""Oracle-SQL text helpers shared by query modules.

The DuckDB DECIMAL→DOUBLE cast is not correctly rounded for wide decimals
(int128 scaling introduces a 1-ulp error), while Spark's BigDecimal→double
is. Bridging through VARCHAR makes DuckDB's conversion correctly rounded
too, so both engines produce bit-identical doubles from the same exact
decimal sum.
"""

DEC = "DECIMAL(18,6)"


def sdec(expr: str) -> str:
    return f"CAST({expr} AS {DEC})"


def osum(expr: str, alias: str) -> str:
    """Exact decimal sum emitted as a correctly-rounded double."""
    return f"CAST(CAST(SUM({expr}) AS VARCHAR) AS DOUBLE) AS {alias}"


def oavg(expr: str, alias: str) -> str:
    """Deterministic mean: exact decimal sum, one double division."""
    return (
        f"CAST(CAST(SUM({expr}) AS VARCHAR) AS DOUBLE)"
        f" / CAST(COUNT({expr}) AS DOUBLE) AS {alias}"
    )


REVENUE = f"{sdec('l_extendedprice')} * (1 - {sdec('l_discount')})"
