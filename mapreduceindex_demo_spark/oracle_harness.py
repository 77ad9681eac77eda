"""Shared cross-engine harness: the DuckDB side of the benchmark
scripts, plus the single-source SQL spellings both engines interpolate.

bench_sf1.py (replica crossover) and duck_suite.py (per-query sf0.1
comparator) must stay METHODOLOGY-IDENTICAL for BASELINE.md tables to be
comparable across rounds — same view construction (including the
events epoch-nanos→µs-timestamp fixup the replica layout needs), same
symmetric forced-checksum spelling. One definition, imported by both.

This module also hosts the ONE-definition SQL fragments that must never
fork between the engines: `duck_hex_int` (DuckDB's hex→int idiom) and
`spark_bigram_sql` (the Spark-side bigram extraction shared by the PMI,
bigram-LM, CCNet, and fastText queries). They live here — not in
functions/ — because their invariant is CROSS-ENGINE spelling parity,
the same contract the forced-checksum helpers carry (r13b review note).
"""

from __future__ import annotations

import os

import duckdb

from mapreduceindex_demo_spark.session import TABLE_NAMES


def _glob(data_dir: str, name: str) -> str:
    path = os.path.join(data_dir, f"{name}.parquet")
    if os.path.isdir(path):
        path += "/*.parquet"
    return path


def duck_connect(data_dir: str) -> "duckdb.DuckDBPyConnection":
    """Connection with one view per engine table over ``data_dir``.

    Replica harnesses store events.ts as epoch-nanos BIGINT (the
    nanosAsLong layout bench_sf1 writes so load_table's conversion path
    stays identical to the testdata); driver testdata stores
    timestamp[us]. Either way the view exposes the µs timestamp the
    oracles expect."""
    con = duckdb.connect()
    # DuckDB's default budget is 80% of PHYSICAL RAM with a spill dir of
    # `.tmp` under the cwd. Both defaults bit this suite: the harnesses
    # run DuckDB NEXT TO a Spark JVM (a heavy oracle + the JVM's RSS
    # overcommit physical memory and the allocator hard-fails — measured
    # at ~sf3 on the r15 RAKE oracle), and the cwd spill dir is how 4.2
    # GB of duckdb_temp_storage got committed to the repo in r14. Cap
    # the budget below RAM-minus-JVM and pin the spill OUTSIDE the repo
    # so heavy oracles degrade to disk, never to a crash or a tracked
    # blob. The cap is DERIVED — min(24 GB, 50% of detected physical
    # RAM) — not a constant: a hardcoded 24 GB only caps on boxes with
    # >~30 GB RAM and silently RAISES the budget above DuckDB's own 80%
    # default on smaller hosts (r15 ADVICE). SPARK_GRAFT_DUCK_MEM_GB
    # overrides for one-off heavy-oracle runs.
    try:
        phys_gb = (
            os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
        ) / (1 << 30)
    except (ValueError, OSError, AttributeError):  # non-POSIX fallback
        phys_gb = 32.0
    mem_gb = int(
        os.environ.get(
            "SPARK_GRAFT_DUCK_MEM_GB", min(24, max(2, int(phys_gb * 0.5)))
        )
    )
    con.execute(f"SET memory_limit='{mem_gb}GB'")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{_glob(data_dir, name)}')"
        )
    (ts_type,) = [
        r[1] for r in con.execute("DESCRIBE events").fetchall() if r[0] == "ts"
    ]
    if ts_type.upper() == "BIGINT":
        con.execute("DROP VIEW events")
        con.execute(
            "CREATE VIEW events AS SELECT event_id, "
            "make_timestamp(CAST(ts // 1000 AS BIGINT)) AS ts, "
            "user_id, event_type, value, props "
            f"FROM read_parquet('{_glob(data_dir, 'events')}')"
        )
    return con


def duck_hex_int(
    col: str,
    start: int = 1,
    nibbles: int = 8,
    alphabet: str = "0123456789abcdef",
) -> str:
    """DuckDB integer value of ``nibbles`` hex chars of ``col`` starting at
    1-based ``start`` — the strpos-nibble idiom (DuckDB has no conv()).
    THE one definition (round-9 review): plans/llm.py, plans/corpus_ops.py
    and any future oracle build their hex→int SQL from here, so a fix to
    the idiom can never silently miss a copy. Pass the uppercase alphabet
    for uppercase-hex columns (e.g. the aHash); md5 output is lowercase."""
    return " + ".join(
        f"(strpos('{alphabet}', substr({col}, {start + p}, 1)) - 1)"
        f" * {16 ** (nibbles - 1 - p)}"
        for p in range(nibbles)
    )


def spark_forced_expr(cols: list[str]) -> str:
    """The Spark side of the symmetric forced-checksum methodology: one
    aggregate over a hash of every output column, fully materializing
    every value with no driver transfer. The mirror of
    :func:`duck_forced_sql`; bench.py, scripts/bench_sf1.py and
    scripts/scaleout_curve.py all build their forcing expression here so
    a methodology change can never fork the timing scripts."""
    return (
        "bit_xor(xxhash64("
        + ", ".join(f"cast(`{c}` as string)" for c in cols)
        + ")) as checksum"
    )


def duck_forced_sql(con: "duckdb.DuckDBPyConnection", oracle: str) -> str:
    """The symmetric forced-checksum query: bit_xor over a hash of every
    output column, so DuckDB fully materializes every value and pays no
    result transfer — the mirror of the Spark side's
    bit_xor(xxhash64(cast(.. as string), ...))."""
    dcols = [r[0] for r in con.execute(f"DESCRIBE ({oracle})").fetchall()]
    return (
        "SELECT bit_xor(hash(concat_ws('|', "
        + ", ".join(f'CAST("{c}" AS VARCHAR)' for c in dcols)
        + f"))) FROM ({oracle})"
    )


def engine_round(x: float, nd: int = 6) -> float:
    """The engine-exact nd-dp grid for driver-side math: round the
    SHORTEST-DECIMAL representation HALF-UP, then normalize -0.0. This
    is what both engines' round(x, nd) actually does — Spark goes
    through BigDecimal.valueOf(double) (= Double.toString, the shortest
    round-trip decimal) with HALF_UP, and DuckDB matches it — so neither
    Python's round() (half-to-even: 0.1015625 → 0.101562 vs the
    engines' 0.101563) nor HALF_UP on the exact binary expansion
    (0.1234565 is stored below the half, → 0.123456 vs the engines'
    0.123457) is a correct mirror; Decimal(repr(x)) + ROUND_HALF_UP
    reproduces both measured cases (r13b review finding; generalized
    from the 6-dp ``abtt_g6`` for the r15 test-mirror sweep)."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-nd)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP)) + 0.0


def spark_bigram_sql(w: str) -> str:
    """The ONE Spark-SQL spelling of adjacent-word bigram extraction over
    a token-array expression ``w`` (empty-guarded: <2 tokens → empty
    array). Shared by the PMI, bigram-logprob, and CCNet queries (r13
    review: three verbatim copies had accreted) so an edge-case fix can
    never silently miss one."""
    # ``w`` is bound ONCE per row as a lambda variable (r16): every caller
    # passes an expression like split(text, ' '), and higher-order
    # functions are interpreted without loop-invariant hoisting, so the
    # unbound spelling re-ran the split for BOTH element_at calls of EVERY
    # bigram (measured 11x on the setsim shingle twin of this pattern).
    # transform(array(e), w0 -> body)[0] == body with w0 := e, exactly.
    return (
        f"transform(array({w}), w0 -> "
        f"CASE WHEN size(w0) < 2 THEN array() "
        f"ELSE transform(sequence(1, size(w0) - 1), "
        f"i -> concat(element_at(w0, i), ' ', element_at(w0, i + 1))) END)[0]"
    )
