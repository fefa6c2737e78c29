"""Dependency-free shared constants.

This module must import NOTHING beyond the stdlib: oracles.py (DuckDB-only
SQL) and operators/sampling.py (PySpark) both read the Poisson(1) CDF
literals from here, and the oracle module has to stay importable in an
environment with no Spark install (a lightweight DuckDB-only checker).
"""

# Explicit whitespace character class, written identically into Spark
# (Java regex) and DuckDB (RE2) patterns. Java's \s is exactly
# [ \t\n\x0B\f\r] but RE2's Perl-style \s EXCLUDES \x0B (vertical tab),
# so any oracle-twinned tokenization written as \s silently depends on
# the corpus containing no \x0b (ADVICE r11 — divergence reproduced
# empirically). Spelling the class out is a semantic NO-OP on the Spark
# side and makes the oracle treat \x0b as a splitter, matching Spark on
# any corpus. Both engines parse the same escape text, so one constant
# serves both (tests/test_cleaning.py pins the \x0b parity).
WS_CLASS = "[ \\t\\n\\x0B\\f\\r]"
WS_PLUS = WS_CLASS + "+"

# Cumulative CDF of Poisson(1) at k = 0..4; k = 5 absorbs the tail. Both
# engines (Spark chained-when in operators/sampling.py:poisson_bootstrap_ci
# and the DuckDB CASE ladder in oracles.py m38_bootstrap_ci) interpolate
# these exact literals so they draw identical bootstrap weights from the
# same md5 uniform.
POISSON1_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
)


def rp_sign(i: int, j: int) -> int:
    """Deterministic ±1 for input dim i, output dim j (Achlioptas 2003
    database-friendly projections use iid ±1 entries). A Weyl-style
    integer mix — no RNG state — so ANY engine can regenerate the exact
    matrix; both the Spark operator (operators/similarity.py
    random_project) and the DuckDB oracle (oracles.py ss_random_project)
    build the projection from these same entries."""
    h = (2654435761 * (i + 1) + 40503 * (j + 1) + 94321) & 0xFFFFFFFF
    return 1 if ((h >> 13) & 1) == 0 else -1
