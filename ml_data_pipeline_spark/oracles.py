"""DuckDB oracle SQL for every oracle-checkable query in queries.ALL_QUERIES.

Written against the driver's pre-registered views (region nation customer
supplier part orders lineitem events documents embeddings). Conventions:
- aliases match the Spark query exactly (the driver sorts columns by name);
- integer aggregates are cast to BIGINT (DuckDB sum() returns HUGEINT);
- floats rounded identically to the Spark side.

Queries WITHOUT an oracle (driver applies rows-only checks) are the
inherently seeded / hash-specific ones: i8 (EM random draws) and
minhash/simhash (xxhash64 signatures — their entire pipeline logic is
oracle-twinned via the md5 recipe, dd_minhash_md5 / dd_simhash_md5_sigs).
b8/b9 graduated in r12 via deterministic survival contracts; ss_ivf_topk
graduated in r12 by swapping the gate's quantizer to the engine-exact
integer-grid Lloyd's twin (_ivf_oracle_sql — MLlib KMeans itself stays
float-order sensitive and unit-covered instead). tx_fingerprint
and ss_semantic_dedup graduated to full oracles in r10: the first via the
engine-independent EQUALITY STRUCTURE of the xxhash64 fingerprint (per-doc
class sizes replayed from the md5 partition), the second because SemDeDup is
deterministic end to end (exact blockwise cosine via list_dot_product).
m12_single_row_inference and ss_cosine_pairs graduated in r11: the first
because normal-equation OLS predictions are scaler-invariant covar_pop
algebra, the second because the sign-LSH planes are a deterministic LCG
stream the oracle embeds as exact DOUBLE literals (similarity.lsh_planes);
ss_ann_topk followed in the same r11 pass (bit_count(xor) probe set +
the recall@10 floor re-derived verbatim in SQL), m5_cross_val (md5-hash
folds + per-fold closed-form OLS R2), m3 (the full metric suite incl.
the 10k-bin Mann-Whitney OVR-AUC over a deterministic nearest-anchor
scorer) and m4 (|standardized OLS coefficient| importances). After the
r12 graduations (b8/b9, ss_ivf_topk, and late-round i8 via the hash-RNG
Box-Muller EM twin, _em_oracle_sql), the rows-only set is exactly the
two xxhash64 hash-function carve-outs: minhash and simhash — whose full
pipeline logic the md5 twins replay.
"""

from __future__ import annotations

from ml_data_pipeline_spark.constants import POISSON1_CDF as _P1CDF

# lineitem with the deterministic null mask used by p2/p3/i1/i2/i4/f7
_LI_NULLS = """
  SELECT l_orderkey, l_linenumber,
         CASE WHEN l_orderkey % 10 = 3 THEN NULL ELSE l_quantity END AS q
  FROM lineitem
"""

_EN = "['the','and','of','to','is','in','that','it','was','for']"
_DE = "['der','die','das','und','ist','nicht','ein','mit','sich','auf']"
_FR = "['le','la','les','et','est','une','dans','que','pour','pas']"
_ES = "['el','la','los','las','es','una','con','por','para','del']"
_TOKS = r"list_filter(string_split_regex(lower(text), '[ \t\n\x0B\f\r]+'), x -> len(x) > 0)"

# shared CTE chain prefix: exact 3-gram Jaccard pairs (CTEs toks..j) —
# consumers that need only the pair scores (dd_incremental_*) use this
# directly instead of string-splitting _NGRAM_PAIRS
_NGRAM_PAIRS_J = r"""
        toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '[ \t\n\x0B\f\r]+'), x -> len(x) > 0) AS tk
            FROM documents
        ),
        grams AS (
            SELECT doc_id,
                   CASE WHEN len(tk) >= 3 THEN
                       list_distinct(list_transform(range(1, len(tk) - 1),
                           i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))
                   ELSE [] END AS gs
            FROM toks
        ),
        base AS (SELECT doc_id, gs FROM grams WHERE len(gs) > 0),
        sizes AS (SELECT doc_id, len(gs) AS ng FROM base),
        ex AS (SELECT doc_id, unnest(gs) AS gram FROM base),
        pairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
            FROM ex a JOIN ex b USING (gram)
            WHERE a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        j AS (
            SELECT id_a, id_b,
                   round(inter * 1.0 / (sa.ng + sb.ng - inter), 6) AS jaccard
            FROM pairs
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
        )
"""

# full chain: pairs + connected components etc. (dd_components /
# dd_keep_canonical) — the prefix above plus the jpairs.. tail
_NGRAM_PAIRS = _NGRAM_PAIRS_J + r""",
        jpairs AS (SELECT id_a, id_b FROM j WHERE jaccard >= 0.2),
        edges AS (
            SELECT id_a AS a, id_b AS b FROM jpairs
            UNION ALL
            SELECT id_b, id_a FROM jpairs
        ),
        reach AS (
            SELECT a AS id, a AS r FROM edges
            UNION
            SELECT reach.id, e.b FROM reach JOIN edges e ON e.a = reach.r
        ),
        comp AS (
            SELECT id, CAST(min(r) AS BIGINT) AS component FROM reach GROUP BY id
        )
"""

# shared AUC score base (queries._auc_base twin): integer-grid coarsened
# score — tuned once for a .00005 rounding-boundary bug. r11: interpolated
# into EVERY site (m18/m19/m21/m22/m34/m23) — the hand-kept copies were
# exactly the inline-drift hazard the repo documents
_AUC_BASE_SQL = """base AS (
            SELECT CAST(c_acctbal > 0 AS INT) AS y,
                   ((CAST(round(c_acctbal * 100) AS BIGINT) + 100000
                     + (c_custkey % 1000) * 100) // 120) / 20000.0 AS s
            FROM customer
        )"""

# 8-bit Morton interleave of columns x,y as explicit bit arithmetic
# (mirrors skew.zorder_key exactly; generated once so both dims stay in
# lockstep with the Spark loop)
_ZKEY_8 = " + ".join(
    f"(((x >> {i}) & 1) * {1 << (2 * i)}) + (((y >> {i}) & 1) * {1 << (2 * i + 1)})"
    for i in range(8)
)



def _kmeans_oracle_sql(k: int = 3, iters: int = 4) -> str:
    """Unrolled Lloyd's-iteration SQL mirroring ml.clustering.kmeans_fit_2d
    (generated, so k/iters stay in lockstep with the Spark loop — same
    pattern as _ZKEY_8 above)."""
    ctes = [
        # MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and each
        # pivot stage is referenced many times by the next iteration — the
        # unrolled chain re-evaluates exponentially without it
        """base AS MATERIALIZED (
            SELECT o_orderkey AS id,
                   CAST(round(o_totalprice * 100, 0) AS BIGINT) AS x,
                   date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS y
            FROM orders
        )""",
        f"""init AS MATERIALIZED (
            SELECT x, y, row_number() OVER (
                ORDER BY md5(CAST(id AS VARCHAR)), id) AS rn
            FROM base ORDER BY md5(CAST(id AS VARCHAR)), id LIMIT {k}
        )""",
        "p0 AS MATERIALIZED (SELECT "
        + ", ".join(
            f"max(CASE WHEN rn = {j + 1} THEN CAST(x AS DOUBLE) END) AS c{j}x, "
            f"max(CASE WHEN rn = {j + 1} THEN CAST(y AS DOUBLE) END) AS c{j}y"
            for j in range(k)
        )
        + " FROM init)",
    ]
    for i in range(1, iters + 1):
        dists = ", ".join(
            f"(x - c{j}x) * (x - c{j}x) + (y - c{j}y) * (y - c{j}y) AS d{j}"
            for j in range(k)
        )
        least = "least(" + ", ".join(f"d{j}" for j in range(k)) + ")"
        case = (
            "CASE "
            + " ".join(f"WHEN d{j} = m THEN {j}" for j in range(k - 1))
            + f" ELSE {k - 1} END"
        )
        ctes.append(
            f"""a{i} AS MATERIALIZED (
            SELECT id, x, y, {case} AS cluster
            FROM (SELECT *, {least} AS m
                  FROM (SELECT base.*, {dists} FROM base, p{i - 1}))
        )"""
        )
        ctes.append(
            f"""u{i} AS MATERIALIZED (
            SELECT cluster,
                   CAST(sum(x) AS DOUBLE) / count(*) AS cx,
                   CAST(sum(y) AS DOUBLE) / count(*) AS cy
            FROM a{i} GROUP BY 1
        )"""
        )
        ctes.append(
            f"p{i} AS MATERIALIZED (SELECT "
            + ", ".join(
                f"coalesce(max(CASE WHEN cluster = {j} THEN cx END),"
                f" (SELECT c{j}x FROM p{i - 1})) AS c{j}x, "
                f"coalesce(max(CASE WHEN cluster = {j} THEN cy END),"
                f" (SELECT c{j}y FROM p{i - 1})) AS c{j}y"
                for j in range(k)
            )
            + f" FROM u{i})"
        )
    finals = " UNION ALL ".join(
        f"SELECT CAST({j} AS INT) AS cluster, c{j}x AS cx, c{j}y AS cy FROM p{iters}"
        for j in range(k)
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
        cents AS ({finals}),
        counts AS (SELECT cluster, count(*) AS n_points FROM a{iters} GROUP BY 1)
        SELECT c.cluster, c.cx, c.cy,
               CAST(coalesce(n.n_points, 0) AS BIGINT) AS n_points
        FROM cents c LEFT JOIN counts n ON c.cluster = n.cluster"""
    )

from ml_data_pipeline_spark.constants import rp_sign as _rp_sign

# random-projection matrix rows (ss_random_project), regenerated from the
# SAME sign function the Spark operator uses — lockstep by construction
_RP_SCALE = 1.0 / 8 ** 0.5
_RP_ROWS = ", ".join(
    f"round(list_dot_product(embedding::DOUBLE[], ["
    + ", ".join(f"{_rp_sign(i, j)}.0" for i in range(64))
    + f"]) * {_RP_SCALE!r}, 6)"
    for j in range(8)
)

# PageRank power iterations (q_pagerank), unrolled: c{i} = per-node
# contribution sums, r{i} = rank update. The gate graph is symmetrized, so
# every node has out-degree >= 1 and the dangling-mass term is exactly 0 —
# the Spark operator computes it generally (it is +0 here).
_PR_ITERS = "".join(
    f"""
        c{i} AS (
            SELECT e.dst AS node, sum(r{i - 1}.rank / od.od) AS s
            FROM edges e
            JOIN r{i - 1} ON r{i - 1}.node = e.src
            JOIN outdeg od ON od.src = e.src
            GROUP BY e.dst
        ),
        r{i} AS (
            SELECT nd.node, 0.15 / nn.n + 0.85 * coalesce(c{i}.s, 0) AS rank
            FROM nodes nd CROSS JOIN nn LEFT JOIN c{i} ON c{i}.node = nd.node
        ),"""
    for i in range(1, 6)
).rstrip(",")

ALL_ORACLES: dict[str, str] = {
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               round(avg(l_quantity), 6) AS avg_qty,
               round(avg(l_extendedprice), 6) AS avg_price,
               round(avg(l_discount), 6) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-01-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q3_shipping_priority": """
        SELECT l_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer
        JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1997-01-01'
          AND l_shipdate > TIMESTAMP '1997-01-01'
        GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d')
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    "q5_region_revenue": """
        SELECT n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer
        JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """,
    "q_topk_per_group": """
        SELECT o_orderpriority, o_orderkey,
               round(o_totalprice, 2) AS o_totalprice,
               CAST(rk AS INTEGER) AS rk
        FROM (
            SELECT o_orderpriority, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_orderpriority
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rk
            FROM orders
        )
        WHERE rk <= 3
        ORDER BY o_orderpriority, rk
    """,
    "q_sessionize": """
        WITH t AS (
            SELECT user_id,
                   CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                             OR (epoch_us(ts) - lag(epoch_us(ts)) OVER w) > 1800000000
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions,
               count(*) AS n_events
        FROM t GROUP BY user_id ORDER BY user_id
    """,
    "q_events_hourly": """
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
               event_type, count(*) AS n,
               round(sum(value), 6) AS total_value
        FROM events
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "q_asof_join": """
        WITH o AS (
            SELECT o_custkey, o_orderdate, max(o_totalprice) AS o_totalprice
            FROM orders GROUP BY o_custkey, o_orderdate
        )
        SELECT e.event_id, e.user_id,
               round(o.o_totalprice, 2) AS last_order_price
        FROM events e
        ASOF LEFT JOIN o
          ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        ORDER BY e.event_id
    """,
    "q_pivot": """
        SELECT l_returnflag,
               round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_o,
               round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_f
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "q_unpivot": """
        WITH wide AS (
            SELECT l_returnflag,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_price
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, metric, value FROM (
            SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM wide
            UNION ALL
            SELECT l_returnflag, 'sum_price', sum_price FROM wide
        ) ORDER BY l_returnflag, metric
    """,
    "q_rollup": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    "q_cube": """
        SELECT o_orderstatus, o_orderpriority,
               round(sum(o_totalprice), 2) AS total, count(*) AS n
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    "q_having": """
        SELECT c_custkey, c_name, count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_custkey, c_name
        HAVING count(*) > 12
        ORDER BY n_orders DESC, c_custkey
    """,
    "q_set_ops": """
        SELECT c_custkey FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders)
        INTERSECT
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        EXCEPT
        SELECT c_custkey FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        ORDER BY c_custkey
    """,
    # sliding 2h/1h windows: each event contributes to the two windows
    # [floor(ts)-1h, floor(ts)] — reconstructed via a 2-element unnest
    "q_sliding_window": """
        SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS w_start, event_type,
               count(*) AS n
        FROM (
            SELECT unnest([date_trunc('hour', ts) - INTERVAL 1 HOUR,
                           date_trunc('hour', ts)]) AS w_start,
                   event_type
            FROM events
        )
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "q_moving_avg": """
        SELECT user_id, event_id,
               round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS mavg3
        FROM events ORDER BY user_id, event_id
    """,
    "ss_brute_pairs": """
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(round(list_cosine_similarity(a.embedding, b.embedding), 6), 4) AS cosine
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(a.embedding, b.embedding), 6) >= 0.5
        ORDER BY id_a, id_b
    """,
    # streaming twin drained in complete mode == the batch aggregation
    "st_hourly_counts": """
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
               event_type, count(*) AS n,
               round(sum(value), 6) AS total_value
        FROM events
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "q_json_extract": """
        SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
               count(*) AS n, round(avg(value), 6) AS avg_value
        FROM events GROUP BY 1 ORDER BY 1
    """,
    "p1_shape_census": """
        SELECT dtype, n_cols_of_type, (SELECT count(*) FROM orders) AS n_rows, n_cols
        FROM (VALUES ('bigint', 2, 6), ('double', 1, 6), ('string', 2, 6),
                     ('timestamp', 1, 6)) t(dtype, n_cols_of_type, n_cols)
        -- 'timestamp' (not _ntz): catalog.load_table normalizes NTZ scans
        -- to session-TZ TIMESTAMP, so shape_census reports 'timestamp'
    """,
    # P5 classifications derive from the orders schema (deterministic)
    "p5_type_classification": """
        SELECT * FROM (VALUES
            ('o_custkey', 'numeric'), ('o_orderdate', 'date'),
            ('o_orderkey', 'numeric'), ('o_orderpriority', 'categorical'),
            ('o_orderstatus', 'categorical'), ('o_totalprice', 'numeric')
        ) t("column", type_class)
    """,
    # T7 on orders⋈orders: id-ish names excluded; approx-distinct < 0.9n
    # (margins far from the boundary at sf0.01 — see queries.py)
    "t7_target_candidates": """
        SELECT * FROM (VALUES
            ('o_custkey', false), ('o_orderdate', true), ('o_orderkey', false),
            ('o_orderpriority', true), ('o_orderstatus', true), ('o_totalprice', false)
        ) t("column", is_target_candidate)
    """,
    "s13_question_template": """
        SELECT 'c_custkey' AS "column",
               'Enter a value between ' || CAST(min(c_custkey) AS VARCHAR) ||
               ' and ' || CAST(max(c_custkey) AS VARCHAR) AS prompt
        FROM customer
        UNION ALL
        SELECT 'c_mktsegment',
               'Choose one of: ' || string_agg(DISTINCT c_mktsegment, ', ' ORDER BY c_mktsegment)
        FROM customer
    """,
    "p2_missing_counts": """
        SELECT 'l_quantity' AS "column",
               CAST(sum(CASE WHEN l_orderkey % 10 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_missing,
               round(sum(CASE WHEN l_orderkey % 10 = 3 THEN 1 ELSE 0 END) * 100.0 / count(*), 6)
                   AS pct_missing,
               sum(CASE WHEN l_orderkey % 10 = 3 THEN 1 ELSE 0 END) * 2 > count(*)
                   AS flag_over_half
        FROM lineitem
        HAVING sum(CASE WHEN l_orderkey % 10 = 3 THEN 1 ELSE 0 END) > 0
    """,
    "p3_total_missing": """
        SELECT CAST(sum(CASE WHEN l_orderkey % 10 = 3 THEN 1 ELSE 0 END) AS BIGINT)
               AS total_missing
        FROM lineitem
    """,
    "p4_distinct_counts": """
        SELECT "column", n_distinct FROM (
            SELECT 'o_orderstatus' AS "column", count(DISTINCT o_orderstatus) AS n_distinct
            FROM orders
            UNION ALL
            SELECT 'o_orderpriority', count(DISTINCT o_orderpriority) FROM orders
        ) ORDER BY n_distinct, "column"
    """,
    "p6_value_counts": """
        SELECT l_returnflag, count(*) AS count
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "p7_rare_values": """
        SELECT p_name, count(*) AS count FROM part
        WHERE p_name IS NOT NULL
        GROUP BY p_name HAVING count(*) <= 30
        ORDER BY count, p_name
    """,
    "p7_rare_summary": """
        WITH rare AS (
            SELECT p_name, count(*) AS c FROM part
            WHERE p_name IS NOT NULL
            GROUP BY p_name HAVING count(*) <= 30
        )
        SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS total_rare_rows,
               count(*) AS n_rare_values,
               min(c) AS min_freq, max(c) AS max_freq
        FROM rare
    """,
    "p8_class_distribution": """
        SELECT c_mktsegment, count(*) AS count
        FROM customer GROUP BY c_mktsegment
        ORDER BY count DESC, c_mktsegment LIMIT 15
    """,
    "p9_head_tail": """
        WITH counts AS (SELECT lang, count(*) AS count FROM documents GROUP BY lang),
        ranked AS (
            SELECT lang, count,
                   row_number() OVER (ORDER BY count DESC, lang) AS rd,
                   row_number() OVER (ORDER BY count ASC, lang DESC) AS ra
            FROM counts
        )
        SELECT lang, count FROM ranked
        WHERE rd <= 3 OR ra <= 2
        ORDER BY count DESC, lang
    """,
    "p10_example_values": """
        SELECT DISTINCT substr(p_type, 1, 30) AS example
        FROM part WHERE p_type IS NOT NULL
        ORDER BY example LIMIT 3
    """,
    "p11_column_range": """
        SELECT min(l_extendedprice) AS min_value, max(l_extendedprice) AS max_value
        FROM lineitem
    """,
    "p12_correlation": """
        SELECT 'l_discount' AS column_a, 'l_tax' AS column_b,
               round(corr(l_discount, l_tax), 6) AS corr FROM lineitem
        UNION ALL SELECT 'l_extendedprice', 'l_discount',
               round(corr(l_extendedprice, l_discount), 6) FROM lineitem
        UNION ALL SELECT 'l_extendedprice', 'l_tax',
               round(corr(l_extendedprice, l_tax), 6) FROM lineitem
        UNION ALL SELECT 'l_quantity', 'l_discount',
               round(corr(l_quantity, l_discount), 6) FROM lineitem
        UNION ALL SELECT 'l_quantity', 'l_extendedprice',
               round(corr(l_quantity, l_extendedprice), 6) FROM lineitem
        UNION ALL SELECT 'l_quantity', 'l_tax',
               round(corr(l_quantity, l_tax), 6) FROM lineitem
        ORDER BY column_a, column_b
    """,
    "p13_histogram": """
        SELECT event_type, CAST(floor(value / 10.0) AS BIGINT) AS bin,
               count(*) AS count,
               round(CAST(floor(value / 10.0) AS BIGINT) * CAST(10.0 AS DOUBLE), 6) AS bin_lo
        FROM events WHERE value IS NOT NULL
        GROUP BY event_type, floor(value / 10.0)
        ORDER BY event_type, bin
    """,
    "f3_range_filter": """
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM lineitem WHERE l_quantity >= 10 AND l_quantity <= 20
    """,
    "f5_in_list_filter": """
        SELECT o_orderkey, o_orderpriority
        FROM orders WHERE CAST(o_orderpriority AS VARCHAR) IN ('1-URGENT', '2-HIGH')
    """,
    "f7_drop_null_rows": f"""
        SELECT l_orderkey, l_linenumber, q AS l_quantity
        FROM ({_LI_NULLS}) WHERE q IS NOT NULL
    """,
    "f8_merge_interval": """
        SELECT l_quantity, count(*) AS count FROM (
            SELECT CASE WHEN l_quantity BETWEEN 10 AND 20 THEN 15.0 ELSE l_quantity END
                   AS l_quantity
            FROM lineitem
        ) GROUP BY l_quantity ORDER BY l_quantity
    """,
    "f13_exact_dedup": """
        SELECT doc_id, lang, source, n_chars FROM documents
        QUALIFY row_number() OVER (PARTITION BY text
                                   ORDER BY doc_id, lang, source, n_chars) = 1
    """,
    "e1_one_hot": """
        SELECT o_orderkey,
               CAST(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS INTEGER) AS o_orderstatus_F,
               CAST(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END AS INTEGER) AS o_orderstatus_O,
               CAST(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END AS INTEGER) AS o_orderstatus_P
        FROM orders
    """,
    "e2_label_encode": """
        WITH m AS (
            SELECT val, CAST(dense_rank() OVER (ORDER BY val) - 1 AS BIGINT) AS code
            FROM (SELECT DISTINCT CAST(c_mktsegment AS VARCHAR) AS val
                  FROM customer WHERE c_mktsegment IS NOT NULL)
        )
        SELECT c_custkey, c_mktsegment, m.code AS c_mktsegment_code
        FROM customer LEFT JOIN m ON CAST(c_mktsegment AS VARCHAR) = m.val
    """,
    "e3_target_encode": """
        WITH m AS (SELECT c_mktsegment, avg(c_acctbal) AS enc FROM customer GROUP BY c_mktsegment)
        SELECT c.c_custkey, round(m.enc, 6) AS c_mktsegment_encoded
        FROM customer c LEFT JOIN m USING (c_mktsegment)
    """,
    "e4_frequency_encode": """
        WITH m AS (SELECT c_mktsegment, count(*) AS cnt FROM customer GROUP BY c_mktsegment)
        SELECT c.c_custkey,
               round(m.cnt * 1.0 / (SELECT count(*) FROM customer), 6)
                   AS c_mktsegment_freq_encoded
        FROM customer c LEFT JOIN m USING (c_mktsegment)
    """,
    "e5_binary_encode": """
        WITH m AS (
            SELECT val, CAST(dense_rank() OVER (ORDER BY val) AS BIGINT) AS code
            FROM (SELECT DISTINCT CAST(o_orderpriority AS VARCHAR) AS val
                  FROM orders WHERE o_orderpriority IS NOT NULL)
        )
        SELECT o_orderkey,
               CAST((code >> 2) & 1 AS INTEGER) AS o_orderpriority_0,
               CAST((code >> 1) & 1 AS INTEGER) AS o_orderpriority_1,
               CAST(code & 1 AS INTEGER) AS o_orderpriority_2
        FROM orders LEFT JOIN m ON CAST(o_orderpriority AS VARCHAR) = m.val
    """,
    "e6_date_features": """
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INTEGER) AS o_orderdate_year,
               CAST(month(o_orderdate) AS INTEGER) AS o_orderdate_month,
               CAST(day(o_orderdate) AS INTEGER) AS o_orderdate_day,
               CAST(isodow(o_orderdate) - 1 AS INTEGER) AS o_orderdate_dayofweek,
               CAST(weekofyear(o_orderdate) AS INTEGER) AS o_orderdate_week,
               CAST(quarter(o_orderdate) AS INTEGER) AS o_orderdate_quarter
        FROM orders
    """,
    "e8_feature_hash": """
        SELECT c_custkey,
               CAST('0x' || substr(md5(CAST(c_mktsegment AS VARCHAR)), 1, 15) AS BIGINT) % 1000
                   AS seg_hash
        FROM customer
    """,
    "e11_universal_hash": """
        SELECT c_custkey,
               (1103515245 * (CAST('0x' || substr(sha256(CAST(c_mktsegment AS VARCHAR)), 1, 12)
                                   AS BIGINT) % 2147483647)
                + 12345) % 2147483647 % 1000 AS seg_uhash
        FROM customer
    """,
    "e14_clip_round": """
        SELECT l_orderkey, l_linenumber,
               CAST(round(least(50000.0, greatest(1000.0, l_extendedprice)), 0) AS BIGINT)
                   AS l_extendedprice
        FROM lineitem
    """,
    "i1_impute_mean": f"""
        SELECT l_orderkey, l_linenumber,
               round(coalesce(q, avg(q) OVER ()), 6) AS l_quantity
        FROM ({_LI_NULLS})
    """,
    "i2_impute_median": f"""
        SELECT l_orderkey, l_linenumber,
               round(coalesce(q, (SELECT median(q) FROM ({_LI_NULLS}))), 6) AS l_quantity
        FROM ({_LI_NULLS})
    """,
    "i3_impute_mode": """
        WITH base AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 7 = 2 THEN NULL ELSE o_orderpriority END AS p
            FROM orders
        ),
        mode_val AS (
            SELECT p FROM base WHERE p IS NOT NULL
            GROUP BY p ORDER BY count(*) DESC, p ASC LIMIT 1
        )
        SELECT o_orderkey, coalesce(p, (SELECT p FROM mode_val)) AS o_orderpriority
        FROM base
    """,
    "i4_interpolate": """
        WITH base AS (
            SELECT l_orderkey, l_linenumber, l_extendedprice,
                   CASE WHEN l_orderkey % 10 = 3 THEN NULL ELSE l_quantity END AS q
            FROM lineitem
        ),
        pos AS (
            SELECT *, row_number() OVER
                (ORDER BY l_orderkey, l_linenumber, l_extendedprice) AS p
            FROM base
        ),
        ctx AS (
            SELECT *,
                   last_value(q IGNORE NULLS) OVER
                       (ORDER BY l_orderkey, l_linenumber, l_extendedprice
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
                   last_value(CASE WHEN q IS NOT NULL THEN p END IGNORE NULLS) OVER
                       (ORDER BY l_orderkey, l_linenumber, l_extendedprice
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pp,
                   first_value(q IGNORE NULLS) OVER
                       (ORDER BY l_orderkey, l_linenumber, l_extendedprice
                        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
                   first_value(CASE WHEN q IS NOT NULL THEN p END IGNORE NULLS) OVER
                       (ORDER BY l_orderkey, l_linenumber, l_extendedprice
                        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS np
            FROM pos
        )
        SELECT l_orderkey, l_linenumber,
               round(CASE WHEN q IS NOT NULL THEN q
                          ELSE coalesce(pv + (nv - pv) * (p - pp) / (np - pp), pv, nv)
                     END, 6) AS l_quantity
        FROM ctx
    """,
    
    "t1_split_invariants": """
        SELECT count(*) AS n_total, count(*) AS n_train_plus_test FROM customer
    """,
    "e7_simple_hash": """
        SELECT CAST(count(*) AS BIGINT) AS n_rows, CAST(0 AS BIGINT) AS n_out_of_range
        FROM customer
    """,
    "e9_onehot_hash": """
        SELECT CAST(count(*) AS BIGINT) AS n_rows, CAST(0 AS BIGINT) AS n_oor,
               CAST(0 AS BIGINT) AS pair_excess
        FROM part
    """,
    "e10_embedding_hash": """
        SELECT CAST(count(*) AS BIGINT) AS n_rows, CAST(0 AS BIGINT) AS n_out_of_range
        FROM part
    """,
    # CMS width 1000 >> 25 brands: collision-free → estimates == exact counts
    "e12_count_min": """
        SELECT p_brand, CAST(count(*) AS BIGINT) AS brand_cms
        FROM part GROUP BY p_brand ORDER BY p_brand
    """,
    "e16_to_numeric": """
        SELECT p_partkey, round(p_retailprice, 2) AS price_roundtrip FROM part
    """,
    "f1_f2_drop_select_numeric": """
        SELECT c_custkey, c_nationkey FROM customer
    """,
    "f6_null_partition": """
        SELECT CAST(sum(CASE WHEN o_orderkey % 7 <> 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_complete,
               CAST(sum(CASE WHEN o_orderkey % 7 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
        FROM orders
    """,
    # dedup survivor = min doc_id per text (min-struct with doc_id leading)
    "pipe_prepare_corpus": f"""
        WITH surv AS (
            SELECT * FROM documents
            WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
        ),
        gated AS (
            SELECT source, n_chars, len({_TOKS}) AS n_tokens
            FROM surv WHERE n_chars > 100 AND lang = 'en'
        )
        SELECT source, count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
               round(avg(n_chars), 6) AS avg_chars
        FROM gated GROUP BY source ORDER BY source
    """,
    "tx_fingerprint_md5": f"""
        SELECT doc_id, md5(array_to_string({_TOKS}, ' ')) AS fingerprint
        FROM documents
    """,
    "tx_fingerprint": f"""
        WITH fp AS (
            SELECT doc_id, md5(array_to_string({_TOKS}, ' ')) AS fingerprint
            FROM documents
        )
        SELECT doc_id, fingerprint,
               count(*) OVER (PARTITION BY fingerprint) AS xx_class
        FROM fp
    """,
    "ss_semantic_dedup": """
        WITH base AS (
            SELECT vec_id, label,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ),
        n1 AS (
            SELECT vec_id, label, e,
                   sqrt(list_sum(list_transform(e, x -> x*x))) AS nrm
            FROM base
        ),
        nv AS (
            SELECT vec_id, label, list_transform(e, x -> x / nrm) AS v
            FROM n1 WHERE nrm <> 0
        ),
        dominated AS (
            SELECT DISTINCT b.vec_id
            FROM nv a JOIN nv b ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE round(list_dot_product(a.v, b.v), 6) >= 0.35
        )
        SELECT e.vec_id, e.label
        FROM embeddings e ANTI JOIN dominated d ON e.vec_id = d.vec_id
        ORDER BY e.vec_id
    """,
    "i5_impute_knn": """
        SELECT CAST(count(*) AS BIGINT) AS n_rows, CAST(0 AS BIGINT) AS n_nulls_after
        FROM lineitem
    """,
    "i6_impute_mice": """
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(0 AS BIGINT) AS nulls_q, CAST(0 AS BIGINT) AS nulls_tax
        FROM lineitem
    """,
    "i7_hot_deck": """
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(0 AS BIGINT) AS n_nulls_after, CAST(0 AS BIGINT) AS n_foreign_fills
        FROM lineitem
    """,
    # I9 with LinearRegression: the model IS OLS → predicted fills equal
    # the DuckDB regression line over the complete rows
    "i9_impute_by_model": """
        WITH c AS (SELECT l_quantity q, l_extendedprice ep FROM lineitem
                   WHERE l_orderkey % 10 <> 3),
             fit AS (SELECT regr_slope(q, ep) AS s, regr_intercept(q, ep) AS i FROM c)
        SELECT l_orderkey, l_linenumber,
               round(i + s * l_extendedprice, 3) AS l_quantity_filled
        FROM lineitem, fit
        WHERE l_orderkey % 10 = 3
    """,
    # multimodal: synth payload byte j of media i = (i*2654435761+j*97+42)%251,
    # payload length = 50+i%200 (operators/multimodal.py synth_media_table) —
    # DuckDB reconstructs the mapInPandas feature math from range()
    "mm_feature_digest": """
        SELECT i AS media_id,
               CAST(50 + i % 200 AS DOUBLE) AS n_bytes,
               CAST(list_sum(list_transform(range(0, 50 + i % 200),
                    j -> (i * 2654435761 + j * 97 + 42) % 251)) % 997 AS DOUBLE) AS s997
        FROM range(100) t(i) ORDER BY media_id
    """,
    "mm_frame_plan": """
        SELECT i AS media_id, CAST(2 * (1 + i % 10) AS BIGINT) AS n_frames
        FROM range(100) t(i) WHERE i % 3 = 2 ORDER BY media_id
    """,
    "mm_media_dedup": """
        SELECT CAST(100 AS BIGINT) AS n_rows, CAST(99 AS BIGINT) AS max_id
    """,
    # M2: OLS is closed-form — MLlib normal solver == DuckDB regr_* exactly
    "m2_ols_coefficients": """
        SELECT round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
               round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept
        FROM lineitem
    """,
    # M6/M9 contract oracles: deterministic trial/point scaffolding
    "m6_random_search_trials": """
        SELECT CAST(i AS INTEGER) AS trial, TRUE AS mean_le_best FROM range(3) t(i)
    """,
    "m9_learning_curve": """
        SELECT CAST(fraction AS DOUBLE) AS fraction, train_finite, test_finite
        FROM (VALUES (0.25, TRUE, TRUE), (0.5, TRUE, TRUE), (1.0, TRUE, TRUE))
            AS t(fraction, train_finite, test_finite)
    """,
    "s1_csv_roundtrip": """
        SELECT c_custkey, c_name, c_nationkey, round(c_acctbal, 2) AS c_acctbal,
               c_mktsegment
        FROM customer
    """,
    "s5_excel_roundtrip": """
        SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey
    """,
    "s6_version_roundtrip": """
        SELECT n_nationkey, n_name, n_regionkey FROM nation
        WHERE n_regionkey <= 2 ORDER BY n_nationkey
    """,
    # balancing count contracts: class sizes after each method are exact
    # (row identity is RNG-dependent and intentionally unchecked)
    "b1_smote_counts": """
        WITH t AS (SELECT c_mktsegment, count(*) AS cnt FROM customer GROUP BY c_mktsegment)
        SELECT c_mktsegment, CAST((SELECT max(cnt) FROM t) AS BIGINT) AS n
        FROM t ORDER BY c_mktsegment
    """,
    "b2_undersample_counts": """
        WITH t AS (SELECT c_mktsegment, count(*) AS cnt FROM customer GROUP BY c_mktsegment)
        SELECT c_mktsegment, CAST((SELECT min(cnt) FROM t) AS BIGINT) AS n
        FROM t ORDER BY c_mktsegment
    """,
    "b3_centroids_counts": """
        WITH t AS (SELECT c_mktsegment, count(*) AS cnt FROM customer GROUP BY c_mktsegment)
        SELECT c_mktsegment, CAST((SELECT min(cnt) FROM t) AS BIGINT) AS n
        FROM t ORDER BY c_mktsegment
    """,
    "b4_nearmiss_counts": """
        WITH t AS (SELECT c_mktsegment, count(*) AS cnt FROM customer GROUP BY c_mktsegment)
        SELECT c_mktsegment, CAST((SELECT min(cnt) FROM t) AS BIGINT) AS n
        FROM t ORDER BY c_mktsegment
    """,
    "b5_oversample_counts": """
        WITH t AS (SELECT c_mktsegment, count(*) AS cnt FROM customer GROUP BY c_mktsegment)
        SELECT c_mktsegment, CAST((SELECT max(cnt) FROM t) AS BIGINT) AS n
        FROM t ORDER BY c_mktsegment
    """,
    "b6_adasyn_counts": """
        WITH t AS (SELECT c_mktsegment, count(*) AS cnt FROM customer GROUP BY c_mktsegment)
        SELECT c_mktsegment, CAST((SELECT max(cnt) FROM t) AS BIGINT) AS n
        FROM t ORDER BY c_mktsegment
    """,
    # B7: borderline-SMOTE still balances to the majority count; the
    # danger_nonempty flag proves the danger selection engaged (5 near-
    # balanced interleaved segments -> mixed neighborhoods guaranteed)
    "b7_borderline_counts": """
        WITH t AS (SELECT c_mktsegment, count(*) AS cnt FROM customer GROUP BY c_mktsegment)
        SELECT c_mktsegment, CAST((SELECT max(cnt) FROM t) AS BIGINT) AS n,
               TRUE AS danger_nonempty
        FROM t ORDER BY c_mktsegment
    """,
    # B8/B9 (VERDICT r11 item 1): the SMOTE+cleaning hybrids can't oracle
    # exact class sizes (removal is LSH-recall/RNG dependent), but the
    # per-class survival invariants are deterministic: every pre-balance
    # class keeps >= frac of the majority count and never exceeds it.
    # The engine emits the booleans; the oracle is the all-TRUE table.
    "b8_smote_tomek": """
        SELECT c_mktsegment, TRUE AS above_floor, TRUE AS within_majority,
               TRUE AS no_new_classes
        FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    "b9_smote_enn": """
        SELECT c_mktsegment, TRUE AS above_floor, TRUE AS within_majority,
               TRUE AS no_new_classes
        FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    "t2_trim_equal_counts": """
        SELECT c_mktsegment, CAST(least(count(*), 100) AS BIGINT) AS n
        FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    "t3_trim_proportional_counts": """
        WITH t AS (SELECT c_mktsegment, count(*) AS cnt FROM customer GROUP BY c_mktsegment),
        tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS s FROM t)
        SELECT c_mktsegment,
               CAST(CASE WHEN s <= 1000 THEN cnt
                         ELSE greatest(1, floor(cnt * (1000.0 / s))) END AS BIGINT) AS n
        FROM t, tot ORDER BY c_mktsegment
    """,
    "t4_trim_majority_counts": """
        WITH t AS (SELECT c_mktsegment, count(*) AS cnt FROM customer GROUP BY c_mktsegment),
        m AS (SELECT c_mktsegment FROM t ORDER BY cnt DESC, c_mktsegment LIMIT 1)
        SELECT c_mktsegment,
               CAST(CASE WHEN c_mktsegment = (SELECT c_mktsegment FROM m)
                         THEN least(cnt, 50) ELSE cnt END AS BIGINT) AS n
        FROM t ORDER BY c_mktsegment
    """,
    "tx_token_count": f"""
        SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens FROM documents
    """,
    "tx_bpe_count": r"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '\w+|[^\w \t\n\x0B\f\r]')) AS BIGINT) AS n_bpe_tokens
        FROM documents
    """,
    "tx_quality": rf"""
        WITH t AS (
            SELECT doc_id, text, {_TOKS} AS tk, len(text) AS nc FROM documents
        ),
        s AS (
            SELECT doc_id, nc, len(tk) AS nw,
                   coalesce(list_sum(list_transform(tk, x -> len(x))), 0) AS tc,
                   len(list_filter(tk, x -> list_contains({_EN}, x))) AS ns,
                   len(regexp_extract_all(text, '[^\w \t\n\x0B\f\r]')) AS np,
                   len(regexp_extract_all(text, '[0-9]')) AS nd
            FROM t
        ),
        r AS (
            SELECT doc_id, nc, nw,
                   CASE WHEN nw > 0 THEN tc * 1.0 / nw ELSE 0.0 END AS mwl,
                   CASE WHEN nc > 0 THEN np * 1.0 / nc ELSE 0.0 END AS pr,
                   CASE WHEN nc > 0 THEN nd * 1.0 / nc ELSE 0.0 END AS dr,
                   CASE WHEN nw > 0 THEN ns * 1.0 / nw ELSE 0.0 END AS sr
            FROM s
        )
        SELECT doc_id,
               CAST(nc AS BIGINT) AS q_n_chars,
               CAST(nw AS BIGINT) AS q_n_words,
               round(mwl, 6) AS q_mean_word_len,
               round(pr, 6) AS q_punct_ratio,
               round(dr, 6) AS q_digit_ratio,
               round(sr, 6) AS q_stopword_ratio,
               round(CASE WHEN mwl >= 3 AND mwl <= 10 THEN CAST(0.4 AS DOUBLE) ELSE 0.0 END
                     + CASE WHEN sr >= 0.05 THEN CAST(0.3 AS DOUBLE) ELSE 0.0 END
                     + CASE WHEN pr <= 0.2 THEN CAST(0.2 AS DOUBLE) ELSE 0.0 END
                     + CASE WHEN nw >= 5 THEN CAST(0.1 AS DOUBLE) ELSE 0.0 END, 6) AS q_score
        FROM r
    """,
    "tx_lang_id": f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
        h AS (
            SELECT doc_id,
                   len(list_filter(tk, x -> list_contains({_EN}, x))) AS he,
                   len(list_filter(tk, x -> list_contains({_DE}, x))) AS hd,
                   len(list_filter(tk, x -> list_contains({_FR}, x))) AS hf,
                   len(list_filter(tk, x -> list_contains({_ES}, x))) AS hs
            FROM t
        )
        SELECT doc_id,
               CASE WHEN greatest(he, hd, hf, hs) = 0 THEN 'und'
                    WHEN hf = greatest(he, hd, hf, hs) THEN 'fr'
                    WHEN hs = greatest(he, hd, hf, hs) THEN 'es'
                    WHEN he = greatest(he, hd, hf, hs) THEN 'en'
                    ELSE 'de' END AS lang_pred
        FROM h
    """,
    # FULL replay of the MinHash-LSH pipeline (late r11 twin gate): md5
    # shingle hash (the proven '0x'||substr(md5) BIGINT recipe), K=8
    # one-permutation bucket minima, global-min densification (min(h) ==
    # least over non-null bucket minima, since every shingle lands in a
    # bucket — avoids engine-specific least()-with-NULL semantics),
    # 4 bands of r=2 with the plain concat string as the bucket key,
    # self-join candidates, slot-agreement Jaccard estimate. est values
    # are exact k/8 multiples, so round(.,6) has no half-boundary risk.
    "dd_minhash_md5": r"""
        WITH docs AS (
            SELECT doc_id AS id,
                   lower(regexp_replace(text, '[ \t\n\x0B\f\r]+', ' ', 'g')) AS norm
            FROM documents
        ),
        sh AS (
            SELECT id,
                   CAST('0x' || substr(md5(substr(norm, i, 5)), 1, 15) AS BIGINT)
                       % 2147483647 AS h
            FROM docs,
                 unnest(generate_series(1, greatest(1, length(norm) - 4))) AS g(i)
        ),
        mins AS (
            SELECT id, min(h) AS fb,
                   min(CASE WHEN h % 8 = 0 THEN h END) AS m0,
                   min(CASE WHEN h % 8 = 1 THEN h END) AS m1,
                   min(CASE WHEN h % 8 = 2 THEN h END) AS m2,
                   min(CASE WHEN h % 8 = 3 THEN h END) AS m3,
                   min(CASE WHEN h % 8 = 4 THEN h END) AS m4,
                   min(CASE WHEN h % 8 = 5 THEN h END) AS m5,
                   min(CASE WHEN h % 8 = 6 THEN h END) AS m6,
                   min(CASE WHEN h % 8 = 7 THEN h END) AS m7
            FROM sh GROUP BY id
        ),
        sig AS (
            SELECT id,
                   coalesce(m0, fb) AS s0, coalesce(m1, fb) AS s1,
                   coalesce(m2, fb) AS s2, coalesce(m3, fb) AS s3,
                   coalesce(m4, fb) AS s4, coalesce(m5, fb) AS s5,
                   coalesce(m6, fb) AS s6, coalesce(m7, fb) AS s7
            FROM mins
        ),
        banded AS (
            SELECT id, s0, s1, s2, s3, s4, s5, s6, s7, b,
                   CASE b WHEN 0 THEN concat_ws(',', s0, s1)
                          WHEN 1 THEN concat_ws(',', s2, s3)
                          WHEN 2 THEN concat_ws(',', s4, s5)
                          ELSE concat_ws(',', s6, s7) END AS bucket
            FROM sig, unnest([0, 1, 2, 3]) AS t(b)
        ),
        pairs AS (
            SELECT DISTINCT a.id AS id_a, c.id AS id_b,
                   round((CAST(a.s0 = c.s0 AS INT) + CAST(a.s1 = c.s1 AS INT)
                        + CAST(a.s2 = c.s2 AS INT) + CAST(a.s3 = c.s3 AS INT)
                        + CAST(a.s4 = c.s4 AS INT) + CAST(a.s5 = c.s5 AS INT)
                        + CAST(a.s6 = c.s6 AS INT) + CAST(a.s7 = c.s7 AS INT))
                       / 8.0, 6) AS est_jaccard
            FROM banded a
            JOIN banded c ON a.b = c.b AND a.bucket = c.bucket AND a.id < c.id
        )
        SELECT id_a, id_b, est_jaccard
        FROM pairs WHERE est_jaccard >= 0.5
        ORDER BY id_a, id_b
    """,
    # FULL replay of the SimHash SIGNATURE stage (late r11 twin): per-doc
    # token counts on the md5 60-bit hash, one vote per bit from the
    # PER-BIT definition (the Spark side's grouped 8x8 aggregate is
    # property-test-proven equal to it), sign -> bit assembly. Votes are
    # integer count sums — exact in both engines, identical tie-breaks.
    # sum() of BIGINT is HUGEINT in DuckDB -> CAST back.
    "dd_simhash_md5_sigs": r"""
        WITH docs AS (
            SELECT doc_id AS id, lower(text) AS txt FROM documents
        ),
        toks AS (
            SELECT id, t
            FROM docs, unnest(string_split_regex(txt, '[ \t\n\x0B\f\r]+')) AS u(t)
            WHERE length(t) > 0
        ),
        per_tok AS (
            SELECT id,
                   CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) AS h,
                   count(*) AS c
            FROM toks GROUP BY 1, 2
        ),
        votes AS (
            SELECT id, b,
                   sum(CASE WHEN (h >> b) & 1 = 1 THEN c ELSE -c END) AS v
            FROM per_tok, unnest(generate_series(0, 63)) AS g(b)
            GROUP BY 1, 2
        )
        SELECT id AS doc_id,
               CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b)
                             ELSE 0 END) AS BIGINT) AS simhash
        FROM votes GROUP BY id ORDER BY doc_id
    """,
    "dd_ngram_jaccard": r"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '[ \t\n\x0B\f\r]+'), x -> len(x) > 0) AS tk
            FROM documents
        ),
        grams AS (
            SELECT doc_id,
                   CASE WHEN len(tk) >= 3 THEN
                       list_distinct(list_transform(range(1, len(tk) - 1),
                           i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))
                   ELSE [] END AS gs
            FROM toks
        ),
        base AS (SELECT doc_id, gs FROM grams WHERE len(gs) > 0),
        sizes AS (SELECT doc_id, len(gs) AS ng FROM base),
        ex AS (SELECT doc_id, unnest(gs) AS gram FROM base),
        pairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
            FROM ex a JOIN ex b USING (gram)
            WHERE a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        j AS (
            SELECT id_a, id_b,
                   round(inter * 1.0 / (sa.ng + sb.ng - inter), 6) AS jaccard
            FROM pairs
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
        )
        SELECT id_a, id_b, jaccard FROM j
        WHERE jaccard >= 0.2 ORDER BY id_a, id_b
    """,
    "dd_components": f"""
        WITH RECURSIVE {_NGRAM_PAIRS}
        SELECT id, component FROM comp ORDER BY id
    """,
    "q_window_suite": """
        SELECT o_custkey, o_orderkey,
               lag(o_totalprice, 1) OVER w AS prev_price,
               lead(o_totalprice, 1) OVER w AS next_price,
               CAST(rank() OVER w AS INT) AS rnk,
               CAST(dense_rank() OVER w AS INT) AS drnk,
               CAST(ntile(4) OVER w AS INT) AS quartile,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6) AS cdist
        FROM orders
        WHERE o_orderkey % 7 = 0
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_custkey, o_orderkey
    """,
    "q_grouping_sets": """
        SELECT n_name, o_orderstatus,
               CAST(grouping(n_name) AS INT) AS g_nation,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(sum(o_totalprice), 2) AS total_price
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY GROUPING SETS ((n_name), (n_name, o_orderstatus))
        ORDER BY n_name, o_orderstatus, g_status
    """,
    "ss_quantize_int8": """
        WITH a AS (
            SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ),
        s AS (
            SELECT vec_id, e,
                   coalesce(list_max(list_transform(e, x -> abs(x))), 0.0) AS mx
            FROM a
        ),
        s2 AS (
            SELECT vec_id, e, CASE WHEN mx > 0 THEN mx ELSE 1.0 END AS scale
            FROM s
        )
        SELECT vec_id,
               md5(array_to_string(list_transform(e,
                   x -> CAST(CAST(round(x * 127.0 / scale) AS INTEGER) AS VARCHAR)), ',')) AS q_md5,
               round(scale, 6) AS q_scale
        FROM s2 ORDER BY vec_id
    """,
    "t8_hash_split": """
        SELECT o_orderkey,
               (CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT)
                % 10000) < 1000 AS is_test
        FROM orders ORDER BY o_orderkey
    """,
    "p15_numeric_summary": """
        SELECT 'l_quantity' AS "column",
               round(CAST(min(l_quantity) AS DOUBLE), 6) AS minv,
               round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.25), 6) AS q25,
               round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.5), 6) AS median,
               round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.75), 6) AS q75,
               round(CAST(max(l_quantity) AS DOUBLE), 6) AS maxv,
               round(avg(CAST(l_quantity AS DOUBLE)), 6) AS mean,
               round(stddev(CAST(l_quantity AS DOUBLE)), 6) AS std
        FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice',
               round(CAST(min(l_extendedprice) AS DOUBLE), 6),
               round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.25), 6),
               round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5), 6),
               round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.75), 6),
               round(CAST(max(l_extendedprice) AS DOUBLE), 6),
               round(avg(CAST(l_extendedprice AS DOUBLE)), 6),
               round(stddev(CAST(l_extendedprice AS DOUBLE)), 6)
        FROM lineitem
        UNION ALL
        SELECT 'l_discount',
               round(CAST(min(l_discount) AS DOUBLE), 6),
               round(quantile_cont(CAST(l_discount AS DOUBLE), 0.25), 6),
               round(quantile_cont(CAST(l_discount AS DOUBLE), 0.5), 6),
               round(quantile_cont(CAST(l_discount AS DOUBLE), 0.75), 6),
               round(CAST(max(l_discount) AS DOUBLE), 6),
               round(avg(CAST(l_discount AS DOUBLE)), 6),
               round(stddev(CAST(l_discount AS DOUBLE)), 6)
        FROM lineitem
    """,
    "s_jsonl_roundtrip": """
        SELECT s_suppkey, s_name, s_nationkey, round(s_acctbal, 2) AS s_acctbal
        FROM supplier ORDER BY s_suppkey
    """,
    "s_orc_roundtrip": """
        SELECT p_partkey, p_name, p_brand, round(p_retailprice, 2) AS p_retailprice
        FROM part ORDER BY p_partkey
    """,
    "tx_redact_pii": r"""
        WITH injected AS (
            SELECT doc_id,
                   text || ' contact user' || doc_id || '@example.com or https://site'
                        || doc_id || '.test/x ip 10.0.' || (doc_id % 200)
                        || '.7 tel +1 (555) 01' || (doc_id % 90 + 10) || '-2301' AS text
            FROM documents
        ),
        counted AS (
            SELECT doc_id, text,
                   CAST(len(regexp_extract_all(text, 'https?://[^ \t\n\x0B\f\r]+')) AS BIGINT) AS n_url,
                   CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
                   CAST(len(regexp_extract_all(text, '\b(\d{1,3}\.){3}\d{1,3}\b')) AS BIGINT) AS n_ip,
                   CAST(len(regexp_extract_all(text, '\+?\d[\d().\- ]{7,}\d')) AS BIGINT) AS n_phone
            FROM injected
        )
        SELECT doc_id,
               md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
                   'https?://[^ \t\n\x0B\f\r]+', '<url>', 'g'),
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<email>', 'g'),
                   '\b(\d{1,3}\.){3}\d{1,3}\b', '<ip>', 'g'),
                   '\+?\d[\d().\- ]{7,}\d', '<phone>', 'g')) AS clean_md5,
               n_url, n_email, n_ip, n_phone
        FROM counted ORDER BY doc_id
    """,
    "tx_strip_html": r"""
        WITH injected AS (
            SELECT doc_id,
                   '<html><body><p class="x">' || text ||
                   '</p><br/>&amp; more &lt;tags&gt; &quot;quoted&quot;</body></html>' AS text
            FROM documents
        )
        SELECT doc_id,
               md5(trim(regexp_replace(
                   replace(replace(replace(replace(replace(
                       regexp_replace(text, '<[^>]+>', ' ', 'g'),
                       '&lt;', '<'), '&gt;', '>'),
                       '&quot;', '"'), '&#39;', ''''), '&amp;', '&'),
                   '[ \t\n\x0B\f\r]+', ' ', 'g'))) AS clean_md5
        FROM injected ORDER BY doc_id
    """,
    "tx_repetition": r"""
        WITH toks AS (
            SELECT doc_id, text,
                   list_filter(string_split_regex(lower(text), '[ \t\n\x0B\f\r]+'), x -> len(x) > 0) AS tk
            FROM documents
        ),
        m AS (
            SELECT doc_id, text, tk,
                   CASE WHEN len(tk) > 0
                        THEN round(1.0 - len(list_distinct(tk)) * 1.0 / len(tk), 6)
                        ELSE 0.0 END AS rep_dup_word_frac
            FROM toks
        ),
        bg AS (
            SELECT doc_id,
                   CASE WHEN len(tk) >= 2
                        THEN list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])
                        ELSE [] END AS gs
            FROM toks
        ),
        ex AS (SELECT doc_id, unnest(gs) AS gram FROM bg),
        cnt AS (SELECT doc_id, gram, count(*) AS c FROM ex GROUP BY 1, 2),
        top AS (
            SELECT doc_id, gram, c,
                   row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, gram ASC) AS rn
            FROM cnt
        ),
        t1 AS (SELECT doc_id, gram AS rep_top_bigram, c FROM top WHERE rn = 1)
        SELECT m.doc_id, m.rep_dup_word_frac, t1.rep_top_bigram,
               CAST(coalesce(t1.c, 0) AS BIGINT) AS rep_top_bigram_count,
               CASE WHEN t1.c IS NOT NULL AND len(m.text) > 0
                    THEN round(t1.c * len(t1.rep_top_bigram) * 1.0 / len(m.text), 6)
                    ELSE 0.0 END AS rep_top_bigram_frac
        FROM m LEFT JOIN t1 ON m.doc_id = t1.doc_id
        ORDER BY m.doc_id
    """,
    "tx_lang_stats": f"""
        WITH t AS (SELECT doc_id, text, {_TOKS} AS tk FROM documents),
        h AS (
            SELECT doc_id, text, len(tk) AS ntok,
                   len(list_filter(tk, x -> list_contains({_EN}, x))) AS he,
                   len(list_filter(tk, x -> list_contains({_DE}, x))) AS hd,
                   len(list_filter(tk, x -> list_contains({_FR}, x))) AS hf,
                   len(list_filter(tk, x -> list_contains({_ES}, x))) AS hs
            FROM t
        ),
        p AS (
            SELECT text, ntok,
                   CASE WHEN greatest(he, hd, hf, hs) = 0 THEN 'und'
                        WHEN hf = greatest(he, hd, hf, hs) THEN 'fr'
                        WHEN hs = greatest(he, hd, hf, hs) THEN 'es'
                        WHEN he = greatest(he, hd, hf, hs) THEN 'en'
                        ELSE 'de' END AS lang_pred
            FROM h
        )
        SELECT lang_pred, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(ntok) AS BIGINT) AS total_tokens,
               round(avg(len(text)), 6) AS avg_chars
        FROM p GROUP BY lang_pred ORDER BY lang_pred
    """,
    "q_null_safe_join": """
        WITH li AS (
            SELECT CASE WHEN l_orderkey % 10 = 3 THEN NULL
                        ELSE l_linenumber END AS k,
                   l_extendedprice
            FROM lineitem
        ),
        dim AS (
            SELECT * FROM (VALUES (NULL, 'null-bucket'), (1, 'one'), (2, 'two')) d(k, label)
        )
        SELECT label, CAST(count(*) AS BIGINT) AS n,
               round(sum(l_extendedprice), 2) AS total
        FROM li JOIN dim ON li.k IS NOT DISTINCT FROM dim.k
        GROUP BY label ORDER BY label
    """,
    "tx_top_ngrams": r"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '[ \t\n\x0B\f\r]+'), x -> len(x) > 0) AS tk
            FROM documents
        ),
        grams AS (
            SELECT doc_id,
                   CASE WHEN len(tk) >= 2 THEN
                       list_distinct(list_transform(range(1, len(tk)),
                           i -> tk[i] || ' ' || tk[i+1]))
                   ELSE [] END AS gs
            FROM toks
        ),
        ex AS (SELECT doc_id, unnest(gs) AS gram FROM grams)
        SELECT gram, CAST(count(*) AS BIGINT) AS doc_freq
        FROM ex GROUP BY gram
        ORDER BY doc_freq DESC, gram ASC LIMIT 20
    """,
    "p17_outliers": """
        WITH stats AS (
            SELECT o_orderpriority,
                   avg(CAST(o_totalprice AS DOUBLE)) AS mu,
                   stddev(CAST(o_totalprice AS DOUBLE)) AS sd
            FROM orders GROUP BY o_orderpriority
        ),
        z AS (
            SELECT o.o_orderkey, o.o_orderpriority,
                   round(o.o_totalprice, 2) AS o_totalprice,
                   round((CAST(o.o_totalprice AS DOUBLE) - s.mu) / s.sd, 6) AS zscore
            FROM orders o JOIN stats s USING (o_orderpriority)
            WHERE s.sd > 0
        )
        SELECT * FROM z WHERE abs(zscore) > 1.5 ORDER BY o_orderkey
    """,
    "s_diff_versions": """
        SELECT c_custkey, 'removed' AS change FROM customer WHERE c_custkey % 97 = 0
        UNION ALL
        SELECT c_custkey, 'changed' FROM customer
        WHERE c_custkey % 97 != 0 AND c_custkey % 53 = 0
        UNION ALL
        SELECT c_custkey + 1000000, 'added' FROM customer WHERE c_custkey % 101 = 0
        ORDER BY c_custkey
    """,
    "p16_grouped_percentiles": """
        SELECT o_orderpriority,
               round(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.25), 6) AS q25,
               round(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.5), 6) AS median,
               round(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.75), 6) AS q75
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "q_exists_semi": """
        SELECT c_custkey, c_mktsegment FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
        )
        ORDER BY c_custkey
    """,
    "tx_chunk_documents": """
        WITH c AS (
            SELECT doc_id,
                   unnest(list_transform(
                          range(0, CAST(ceil(greatest(len(text) - 50, 1) / 150.0) AS BIGINT)),
                          i -> struct_pack(chunk_id := CAST(i AS INTEGER),
                                           chunk := substr(text, CAST(i * 150 + 1 AS BIGINT), 200)))) AS ch
            FROM documents WHERE len(text) > 0
        )
        SELECT doc_id, ch.chunk_id AS chunk_id, md5(ch.chunk) AS chunk_md5
        FROM c ORDER BY doc_id, chunk_id
    """,
    "q_attribution": """
        SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id
        FROM events c
        JOIN events p
          ON c.user_id = p.user_id
         AND c.event_type = 'click' AND p.event_type = 'purchase'
         AND c.ts <= p.ts AND p.ts < c.ts + INTERVAL 1 HOUR
        ORDER BY purchase_id, click_id
    """,
    "m15_grouped_ols": """
        SELECT o_orderpriority,
               round(regr_slope(CAST(o_totalprice AS DOUBLE),
                                CAST(year(o_orderdate) AS DOUBLE)), 6) AS slope,
               round(regr_intercept(CAST(o_totalprice AS DOUBLE),
                                    CAST(year(o_orderdate) AS DOUBLE)), 4) AS intercept,
               count(*) AS n
        FROM orders
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "tx_mixture_plan": r"""
        WITH toks AS (
            SELECT source,
                   CAST(len(list_filter(string_split_regex(lower(text), '[ \t\n\x0B\f\r]+'),
                        x -> len(x) > 0)) AS BIGINT) AS n_tokens
            FROM documents
            WHERE source IN ('src0', 'src1', 'src2')
        ),
        inv AS (
            SELECT source, CAST(sum(n_tokens) AS BIGINT) AS available_tokens,
                   CASE source WHEN 'src0' THEN 0.5 WHEN 'src1' THEN 0.3 ELSE 0.2 END AS w
            FROM toks GROUP BY source
        ),
        tot AS (SELECT sum(w) AS tw FROM inv)
        SELECT source, available_tokens,
               round(w / tw, 6) AS weight,
               round(w / tw * 1000000, 2) AS target_tokens,
               round(least(w / tw * 1000000 / available_tokens, 1.0), 6) AS sample_frac,
               round(w / tw * 1000000 / available_tokens, 6) AS epochs
        FROM inv, tot ORDER BY source
    """,
    "tx_pack_sequences": r"""
        WITH toks AS (
            SELECT doc_id, source,
                   CAST(len(list_filter(string_split_regex(lower(text), '[ \t\n\x0B\f\r]+'),
                        x -> len(x) > 0)) AS BIGINT) AS n_tokens
            FROM documents
        ),
        packed AS (
            SELECT source,
                   CAST(floor(coalesce(sum(n_tokens) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) / 2048.0) AS BIGINT) AS bin_id,
                   n_tokens
            FROM toks
        )
        SELECT source, bin_id, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
        FROM packed GROUP BY source, bin_id ORDER BY source, bin_id
    """,
    "q_not_exists": """
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
        )
        ORDER BY c_custkey
    """,
    "q_correlated_scalar": """
        SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
        FROM orders o
        WHERE o_totalprice > 3 * (
            SELECT avg(o2.o_totalprice) FROM orders o2
            WHERE o2.o_custkey = o.o_custkey
        )
        ORDER BY o_orderkey
    """,
    "q_salted_join": """
        SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
               round(sum(l_extendedprice), 2) AS total_price
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "pipe_clean_corpus": f"""
        WITH RECURSIVE {_NGRAM_PAIRS},
        surv AS (
            SELECT d.doc_id, d.text, d.source FROM documents d
            WHERE d.doc_id NOT IN (SELECT id FROM comp WHERE id != component)
        ),
        stoks AS (
            SELECT doc_id, source, text,
                   list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+'), x -> len(x) > 0) AS tk
            FROM surv
        ),
        rep1 AS (
            SELECT doc_id,
                   CASE WHEN len(tk) > 0
                        THEN round(1.0 - len(list_distinct(tk)) * 1.0 / len(tk), 6)
                        ELSE 0.0 END AS dupfrac
            FROM stoks
        ),
        bg2 AS (
            SELECT doc_id,
                   CASE WHEN len(tk) >= 2
                        THEN list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])
                        ELSE [] END AS gs
            FROM stoks
        ),
        ex2 AS (SELECT doc_id, unnest(gs) AS gram FROM bg2),
        cnt2 AS (SELECT doc_id, gram, count(*) AS c FROM ex2 GROUP BY 1, 2),
        top2 AS (
            SELECT doc_id, gram, c,
                   row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, gram ASC) AS rn
            FROM cnt2
        ),
        t2 AS (SELECT doc_id, gram, c FROM top2 WHERE rn = 1),
        repm AS (
            SELECT s.doc_id, s.source, len(s.tk) AS ntok, r.dupfrac,
                   CASE WHEN t2.c IS NOT NULL AND len(s.text) > 0
                        THEN round(t2.c * len(t2.gram) * 1.0 / len(s.text), 6)
                        ELSE 0.0 END AS topfrac
            FROM stoks s
            JOIN rep1 r USING (doc_id)
            LEFT JOIN t2 USING (doc_id)
        ),
        kept AS (
            SELECT * FROM repm
            WHERE dupfrac <= 0.5 AND topfrac <= 0.18 AND ntok >= 3
        )
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(ntok) AS BIGINT) AS total_tokens
        FROM kept GROUP BY source ORDER BY source
    """,
    "dd_keep_canonical": f"""
        WITH RECURSIVE {_NGRAM_PAIRS}
        SELECT doc_id, lang, source, n_chars FROM documents
        WHERE doc_id NOT IN (SELECT id FROM comp WHERE id != component)
        ORDER BY doc_id
    """,
    "ss_brute_topk": """
        WITH q AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 0),
        s AS (
            SELECT vec_id,
                   list_sum(list_transform(range(1, 65),
                       i -> CAST(embedding[i] AS DOUBLE) * CAST(e[i] AS DOUBLE))) AS dot,
                   sqrt(list_sum(list_transform(embedding,
                       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS na,
                   sqrt(list_sum(list_transform(e,
                       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nb
            FROM embeddings, q
        )
        SELECT vec_id, round(dot / (na * nb), 6) AS cosine
        FROM s ORDER BY cosine DESC, vec_id LIMIT 10
    """,
    # ---- round-2 late additions
    "q6_forecast_revenue": """
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= '1995-01-01' AND l_shipdate < '1997-01-01'
          AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
    """,
    "q14_promo_share": """
        SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                      THEN l_extendedprice * (1 - l_discount)
                                      ELSE 0.0 END)
                     / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_share_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
    "q18_large_orders": """
        WITH big AS (
            SELECT l_orderkey, sum(l_quantity) AS total_qty
            FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 180
        )
        SELECT c_name, o_orderkey, CAST(o_orderdate AS VARCHAR) AS o_orderdate,
               round(o_totalprice, 2) AS o_totalprice,
               CAST(total_qty AS DOUBLE) AS total_qty
        FROM big
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY total_qty DESC, o_orderkey ASC LIMIT 20
    """,
    "q_resample_gapfill": """
        WITH counts AS (
            SELECT event_type, epoch_us(ts) // 21600000000 AS bucket,
                   count(*) AS n_events
            FROM events GROUP BY 1, 2
        ),
        bounds AS (
            SELECT event_type, min(bucket) AS b0, max(bucket) AS b1
            FROM counts GROUP BY 1
        ),
        spine AS (
            SELECT event_type, unnest(range(b0, b1 + 1)) AS bucket FROM bounds
        )
        SELECT s.event_type,
               strftime(make_timestamp(s.bucket * 21600000000),
                        '%Y-%m-%d %H:%M:%S') AS bucket_start,
               coalesce(c.n_events, 0) AS n_events
        FROM spine s
        LEFT JOIN counts c ON s.event_type = c.event_type AND s.bucket = c.bucket
        ORDER BY 1, 2
    """,
    "tx_contamination": r"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '[ \t\n\x0B\f\r]+'),
                               x -> len(x) > 0) AS tk
            FROM documents
        ),
        grams AS (
            SELECT doc_id,
                   CASE WHEN len(tk) >= 5 THEN
                       list_distinct(list_transform(range(1, len(tk) - 3),
                           i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                                || ' ' || tk[i+3] || ' ' || tk[i+4]))
                   ELSE [] END AS gs
            FROM toks
        ),
        train AS (SELECT doc_id AS id, gs FROM grams
                  WHERE doc_id % 17 != 0 AND len(gs) > 0),
        bench AS (SELECT DISTINCT unnest(gs) AS gram FROM grams
                  WHERE doc_id % 17 = 0),
        ex AS (SELECT id, unnest(gs) AS gram FROM train),
        ov AS (
            SELECT id, count(*) AS n_overlap
            FROM ex JOIN bench USING (gram) GROUP BY 1
        )
        SELECT t.id, len(t.gs) AS n_grams,
               coalesce(o.n_overlap, 0) AS n_overlap,
               round(coalesce(o.n_overlap, 0) * 1.0 / len(t.gs), 6)
                   AS contamination_frac,
               round(coalesce(o.n_overlap, 0) * 1.0 / len(t.gs), 6) >= 0.2
                   AS is_contaminated
        FROM train t LEFT JOIN ov o ON t.id = o.id
        ORDER BY t.id
    """,
    "tx_boilerplate": r"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '[ \t\n\x0B\f\r]+'),
                               x -> len(x) > 0) AS tk
            FROM documents
        ),
        grams AS (
            SELECT doc_id,
                   CASE WHEN len(tk) >= 4 THEN
                       list_distinct(list_transform(range(1, len(tk) - 2),
                           i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                                || ' ' || tk[i+3]))
                   ELSE [] END AS gs
            FROM toks
        ),
        base AS (SELECT doc_id AS id, gs FROM grams WHERE len(gs) > 0),
        ex AS (SELECT id, unnest(gs) AS gram FROM base),
        docfreq AS (SELECT gram, count(*) AS df FROM ex GROUP BY 1),
        boiler AS (
            SELECT id, count(*) AS n_boiler
            FROM ex JOIN docfreq USING (gram) WHERE df >= 3 GROUP BY 1
        )
        SELECT b.id, len(b.gs) AS n_grams,
               coalesce(bo.n_boiler, 0) AS n_boiler,
               round(coalesce(bo.n_boiler, 0) * 1.0 / len(b.gs), 6) AS boiler_frac
        FROM base b LEFT JOIN boiler bo ON b.id = bo.id
        ORDER BY b.id
    """,
    "tx_tfidf": r"""
        WITH ex AS (
            SELECT doc_id AS id,
                   unnest(list_filter(string_split_regex(lower(text), '[ \t\n\x0B\f\r]+'),
                                      x -> len(x) > 0)) AS term
            FROM documents
        ),
        tf AS (SELECT id, term, count(*) AS tf FROM ex GROUP BY 1, 2),
        df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
        scored AS (
            SELECT id, term, tf,
                   round(tf * (ln((n_docs + 1) * 1.0 / (df + 1)) + 1.0), 6) AS tfidf
            FROM tf JOIN df USING (term), n
        ),
        ranked AS (
            SELECT id, term, tf, tfidf,
                   row_number() OVER (PARTITION BY id
                                      ORDER BY tfidf DESC, term ASC) AS rank
            FROM scored
        )
        SELECT id, rank, term, tf, tfidf FROM ranked
        WHERE rank <= 3 ORDER BY id, rank
    """,
    "t9_stratified_sample": """
        WITH cut AS (
            SELECT o_orderpriority, o_orderkey,
                   CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
                        AS BIGINT) % 10000 AS bucket,
                   CASE o_orderpriority
                       WHEN '1-URGENT' THEN 5000
                       WHEN '2-HIGH' THEN 2500
                       WHEN '3-MEDIUM' THEN 1000
                       ELSE 500 END AS cutv
            FROM orders
        )
        SELECT o_orderpriority, count(*) AS n_kept
        FROM cut WHERE bucket < cutv
        GROUP BY 1 ORDER BY 1
    """,
    "e18_bucketize": """
        SELECT (CAST(l_extendedprice >= 1000 AS INT)
                + CAST(l_extendedprice >= 5000 AS INT)
                + CAST(l_extendedprice >= 20000 AS INT)
                + CAST(l_extendedprice >= 50000 AS INT)) AS price_bin,
               count(*) AS n_rows,
               round(sum(l_extendedprice), 2) AS sum_price
        FROM lineitem GROUP BY 1 ORDER BY 1
    """,
    "p18_key_skew": """
        WITH c AS (
            SELECT CAST(l_orderkey AS VARCHAR) AS key, count(*) AS cnt
            FROM lineitem GROUP BY 1
        ),
        t AS (SELECT count(*) AS total FROM lineitem)
        SELECT key, cnt, round(cnt * 1.0 / total, 6) AS share,
               CAST(ceil(cnt / 3.0) AS BIGINT) AS salt_factor
        FROM c, t
        ORDER BY cnt DESC, key ASC LIMIT 10
    """,
    "tx_c4_filters": r"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '[ \t\n\x0B\f\r]+'),
                               x -> len(x) > 0) AS tk
            FROM documents
        ),
        m AS (
            SELECT doc_id AS id,
                   len(tk) AS n_words,
                   CASE WHEN len(tk) > 0 THEN
                       list_sum(list_transform(tk, x -> len(x))) * 1.0 / len(tk)
                   END AS mean_len,
                   CASE WHEN len(tk) > 0 THEN
                       len(list_filter(tk, x -> list_contains(
                           ['the','and','of','to','is','in','that','it','was','for'],
                           x))) * 1.0 / len(tk)
                   END AS stop_frac
            FROM toks
        )
        SELECT id, CAST(n_words AS BIGINT) AS n_words,
               round(mean_len, 6) AS mean_word_len,
               round(stop_frac, 6) AS stopword_frac,
               (n_words >= 40 AND n_words <= 100000) AS ok_n_words,
               (mean_len >= 2.0 AND mean_len <= 12.0) AS ok_word_len,
               (stop_frac >= 0.02) AS ok_stopwords,
               ((n_words >= 40 AND n_words <= 100000)
                AND (mean_len >= 2.0 AND mean_len <= 12.0)
                AND (stop_frac >= 0.02)) AS keep
        FROM m ORDER BY id
    """,
    "tx_domain_stats": """
        WITH injected AS (
            SELECT text || ' see https://site' || CAST(doc_id % 23 AS VARCHAR)
                        || '.example.test/page' || CAST(doc_id AS VARCHAR) AS text,
                   n_chars
            FROM documents
        )
        SELECT regexp_extract(text, 'https?://([a-z0-9.-]+)', 1) AS domain,
               count(*) AS n_docs, round(avg(n_chars), 6) AS avg_chars
        FROM injected GROUP BY 1 ORDER BY 1
    """,
    "q_range_frame": """
        SELECT event_id, user_id,
               count(*) OVER w AS n_1h,
               round(sum(value) OVER w, 6) AS sum_1h
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        ORDER BY event_id
    """,
    "m16_lift_table": """
        WITH binned AS (
            SELECT CAST(l_returnflag = 'R' AS INT) AS y,
                   CAST(ceil(cume_dist() OVER (ORDER BY l_extendedprice DESC) * 10)
                        AS INT) AS bin
            FROM lineitem
        ),
        per AS (
            SELECT bin, count(*) AS n, CAST(sum(y) AS BIGINT) AS n_pos
            FROM binned GROUP BY 1
        ),
        t AS (SELECT CAST(sum(n) AS DOUBLE) AS tot,
                     CAST(sum(n_pos) AS DOUBLE) AS tot_pos FROM per)
        SELECT bin, n, n_pos,
               round(n_pos / n, 6) AS pos_rate,
               round((n_pos / n) / (tot_pos / tot), 6) AS lift,
               round(sum(n_pos) OVER (ORDER BY bin
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / tot_pos, 6)
                   AS cum_capture
        FROM per, t ORDER BY bin
    """,
    # funnel oracle: independent algorithm (min-after-min join chain) vs the
    # Spark array-fold walk — equivalent by the greedy-earliest argument.
    "q_funnel": """
        WITH s1 AS (
            SELECT user_id, min(epoch_us(ts)) AS t1
            FROM events WHERE event_type = 'view' GROUP BY 1
        ),
        s2 AS (
            SELECT e.user_id, min(epoch_us(e.ts)) AS t2
            FROM events e JOIN s1 USING (user_id)
            WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t1
            GROUP BY e.user_id
        ),
        s3 AS (
            SELECT e.user_id, min(epoch_us(e.ts)) AS t3
            FROM events e JOIN s2 USING (user_id)
            WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t2
            GROUP BY e.user_id
        ),
        c AS (
            SELECT 1 AS stage_idx, 'view' AS stage,
                   (SELECT count(*) FROM s1) AS n_users
            UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
            UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3)
        )
        SELECT stage_idx, stage, n_users,
               round(n_users * 1.0
                     / coalesce(lag(n_users) OVER (ORDER BY stage_idx), n_users), 6)
                   AS conversion
        FROM c ORDER BY stage_idx
    """,
    "q_cohort_retention": """
        WITH days AS (
            SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d FROM events
        ),
        first AS (SELECT u, min(d) AS cohort_day FROM days GROUP BY 1)
        SELECT CAST(cohort_day AS VARCHAR) AS cohort_day,
               datediff('day', cohort_day, d) AS day_offset,
               count(DISTINCT u) AS n_users
        FROM days JOIN first USING (u)
        WHERE datediff('day', cohort_day, d) <= 7
        GROUP BY first.cohort_day, datediff('day', cohort_day, d)
        ORDER BY 1, 2
    """,
    "p19_psi_drift": """
        WITH binned AS (
            SELECT l_orderkey % 2 AS side,
                   (CAST(l_extendedprice >= 1000 AS INT)
                    + CAST(l_extendedprice >= 5000 AS INT)
                    + CAST(l_extendedprice >= 20000 AS INT)
                    + CAST(l_extendedprice >= 50000 AS INT)) AS bin
            FROM lineitem
        ),
        counts AS (SELECT side, bin, count(*) AS n FROM binned GROUP BY 1, 2),
        shares AS (
            SELECT side, bin, n * 1.0 / sum(n) OVER (PARTITION BY side) AS p
            FROM counts
        ),
        j AS (
            SELECT coalesce(a.bin, b.bin) AS bin,
                   greatest(coalesce(a.p, 0.0), 1e-6) AS pa,
                   greatest(coalesce(b.p, 0.0), 1e-6) AS pb
            FROM (SELECT bin, p FROM shares WHERE side = 0) a
            FULL OUTER JOIN (SELECT bin, p FROM shares WHERE side = 1) b
                 ON a.bin = b.bin
        )
        SELECT bin, round(pa, 6) AS share_a, round(pb, 6) AS share_b,
               round((pa - pb) * ln(pa / pb), 6) AS psi_term
        FROM j ORDER BY bin
    """,
    # orders view with the same deterministic null mask the Spark side applies
    "p20_expectations": """
        WITH o AS (
            SELECT o_orderkey, o_totalprice, o_orderstatus,
                   CASE WHEN o_orderkey % 7 = 2 THEN NULL
                        ELSE o_orderpriority END AS o_orderpriority
            FROM orders
        ),
        r AS (
            SELECT 'not_null(o_orderkey)' AS rule,
                   count(CASE WHEN o_orderkey IS NULL THEN 1 END) AS n_violations
            FROM o
            UNION ALL
            SELECT 'not_null(o_orderpriority)',
                   count(CASE WHEN o_orderpriority IS NULL THEN 1 END) FROM o
            UNION ALL
            SELECT 'unique(o_orderkey)',
                   count(*) - count(DISTINCT o_orderkey) FROM o
            UNION ALL
            SELECT 'in_range(o_totalprice,0.0,1000.0)',
                   count(CASE WHEN o_totalprice IS NOT NULL
                              AND (o_totalprice < 0.0 OR o_totalprice > 1000.0)
                              THEN 1 END) FROM o
            UNION ALL
            SELECT 'in_set(o_orderstatus)',
                   count(CASE WHEN o_orderstatus IS NOT NULL
                              AND o_orderstatus NOT IN ('O','F','P')
                              THEN 1 END) FROM o
            UNION ALL
            SELECT 'regex(o_orderpriority)',
                   count(CASE WHEN o_orderpriority IS NOT NULL
                              AND NOT regexp_matches(o_orderpriority, '^[1-5]-[A-Z ]+$')
                              THEN 1 END) FROM o
        )
        SELECT rule, CAST(n_violations AS BIGINT) AS n_violations,
               n_violations = 0 AS passed
        FROM r ORDER BY rule
    """,
    # oracle recomputes the rollup FROM SCRATCH — the incremental merge on
    # the Spark side must land on the identical table
    "s15_incremental_rollup": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               count(l_quantity) AS n_rows,
               round(min(l_extendedprice), 2) AS min_price,
               round(max(l_extendedprice), 2) AS max_price,
               round(sum(l_extendedprice) / count(l_quantity), 6) AS avg_price
        FROM lineitem
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    # brute-force all-pairs — the blocked Spark plan must match it exactly
    "q_fuzzy_pairs": """
        WITH names AS (SELECT DISTINCT p_name FROM part)
        SELECT a.p_name AS name_a, b.p_name AS name_b,
               levenshtein(a.p_name, b.p_name) AS distance
        FROM names a JOIN names b ON a.p_name < b.p_name
        WHERE levenshtein(a.p_name, b.p_name) <= 2
        ORDER BY 1, 2
    """,
    "q_event_transitions": """
        WITH seq AS (
            SELECT user_id, event_type,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev_type
            FROM events
        )
        SELECT prev_type, event_type AS next_type, count(*) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "q_seasonal_anomaly": """
        WITH keyed AS (
            SELECT event_id, event_type, extract(hour FROM ts) AS hod, value
            FROM events
        ),
        stats AS (
            SELECT event_type, hod, avg(value) AS mu, stddev_samp(value) AS sd
            FROM keyed GROUP BY 1, 2
        )
        SELECT k.event_id, k.event_type, CAST(k.hod AS INT) AS hod,
               round(k.value, 6) AS value,
               round((k.value - s.mu) / s.sd, 6) AS zscore
        FROM keyed k JOIN stats s ON k.event_type = s.event_type AND k.hod = s.hod
        WHERE s.sd > 0 AND abs((k.value - s.mu) / s.sd) > 3.0
        ORDER BY k.event_id
    """,
    # parallel unnests zip positionally in DuckDB (WITH ORDINALITY is absent)
    "ss_label_centroids": """
        WITH ex AS (
            SELECT label,
                   unnest(range(0, len(embedding))) AS idx,
                   unnest(embedding) AS v
            FROM embeddings
        )
        SELECT label, CAST(idx AS INT) AS idx,
               round(avg(CAST(v AS DOUBLE)), 6) AS centroid_v
        FROM ex GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "pipe_entity_resolution": """
        WITH RECURSIVE names AS (
            SELECT p_name, min(p_partkey) AS name_id FROM part GROUP BY 1
        ),
        fpairs AS (
            SELECT a.name_id AS id_a, b.name_id AS id_b
            FROM names a JOIN names b ON a.p_name < b.p_name
            WHERE levenshtein(a.p_name, b.p_name) <= 2
        ),
        edges AS (
            SELECT id_a AS a, id_b AS b FROM fpairs
            UNION ALL SELECT id_b, id_a FROM fpairs
        ),
        reach AS (
            SELECT a AS id, a AS r FROM edges
            UNION
            SELECT reach.id, e.b FROM reach JOIN edges e ON e.a = reach.r
        ),
        comp AS (SELECT id, min(r) AS component FROM reach GROUP BY 1)
        SELECT n.p_name,
               cn.p_name AS canonical_name
        FROM names n
        LEFT JOIN comp c ON n.name_id = c.id
        JOIN names cn ON cn.name_id = coalesce(c.component, n.name_id)
        ORDER BY n.p_name
    """,
    "m17_calibration": """
        WITH s AS (
            -- floor, not ::INT: DuckDB's double->int cast ROUNDS, Spark's truncates
            SELECT CAST(least(floor((l_extendedprice / 100000.0) * 10), 9) AS INT) AS bin,
                   least(l_extendedprice / 100000.0, 1.0) AS p,
                   CAST(l_returnflag = 'R' AS INT) AS y
            FROM lineitem
        )
        SELECT bin, count(*) AS n,
               round(avg(p), 6) AS mean_score,
               round(avg(y), 6) AS frac_pos
        FROM s GROUP BY 1 ORDER BY 1
    """,
    # quantile_cont = Spark's exact percentile (both linear interpolation)
    "p21_mad_outliers": """
        WITH med AS (
            SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS m
            FROM lineitem GROUP BY 1
        ),
        dev AS (
            SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
                   l.l_extendedprice, abs(l.l_extendedprice - med.m) AS d
            FROM lineitem l JOIN med USING (l_returnflag)
        ),
        mad AS (
            SELECT l_returnflag, quantile_cont(d, 0.5) AS mad FROM dev GROUP BY 1
        )
        SELECT dev.l_orderkey, dev.l_linenumber, dev.l_returnflag,
               round(dev.l_extendedprice, 2) AS l_extendedprice,
               round(dev.d / mad.mad, 6) AS mad_score
        FROM dev JOIN mad USING (l_returnflag)
        WHERE mad.mad > 0 AND round(dev.d / mad.mad, 6) > 2.5
        ORDER BY 1, 2, 4
    """,
    "p22_chi2_mi": """
        WITH obs AS (
            SELECT o_orderpriority AS a, o_orderstatus AS b, count(*) AS o
            FROM orders
            WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL
            GROUP BY 1, 2
        ),
        t AS (SELECT CAST(sum(o) AS DOUBLE) AS n FROM obs),
        ma AS (SELECT a, CAST(sum(o) AS DOUBLE) AS ra FROM obs GROUP BY 1),
        mb AS (SELECT b, CAST(sum(o) AS DOUBLE) AS cb FROM obs GROUP BY 1),
        cells AS (
            SELECT o, n, ra * cb / n AS e, o / n AS pij, ra / n AS pi, cb / n AS pj
            FROM obs JOIN ma USING (a) JOIN mb USING (b), t
        )
        -- chi2 includes EMPTY cells via sum_all(e) = n:
        -- sum_obs((o-e)²/e - e) + n  (matches the engine's identity)
        SELECT round(sum((o - e) * (o - e) / e - e) + any_value(n), 6) AS chi2,
               round(sum(pij * ln(pij / (pi * pj))), 6) AS mutual_info,
               count(*) AS n_cells,
               CAST((SELECT (count(*) - 1) FROM ma)
                    * (SELECT (count(*) - 1) FROM mb) AS BIGINT) AS dof
        FROM cells
    """,
    "e19_winsorize": """
        WITH b AS (
            SELECT quantile_cont(l_extendedprice, 0.05) AS lo,
                   quantile_cont(l_extendedprice, 0.95) AS hi
            FROM lineitem
        ),
        w AS (
            SELECT least(greatest(l_extendedprice, lo), hi) AS x
            FROM lineitem, b
        )
        SELECT count(*) AS n,
               round(min(x), 6) AS min_price,
               round(max(x), 6) AS max_price,
               round(avg(x), 6) AS mean_price
        FROM w
    """,
    "q10_returned_revenue": """
        SELECT c_custkey, c_name, n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
        GROUP BY 1, 2, 3
        ORDER BY revenue DESC, c_custkey ASC LIMIT 20
    """,
    "q12_priority_by_status": """
        SELECT l_linestatus,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_priority_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 0 ELSE 1 END) AS BIGINT) AS low_priority_count
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_linestatus
        ORDER BY l_linestatus
    """,
    "q19_disjunctive_revenue": """
        SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS n_items
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE (p_type = 'PROMO' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 15)
           OR (p_type = 'STANDARD' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 25)
           OR (p_type = 'ECONOMY' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 35)
    """,
    "tx_unigram_logprob": """
        WITH ex AS (
            SELECT doc_id AS id,
                   unnest(list_filter(
                       regexp_split_to_array(lower(text), '[ \\t\\n\\x0B\\f\\r]+'),
                       x -> len(x) > 0)) AS t
            FROM documents
        ),
        vocab AS (SELECT t, count(*) AS cnt FROM ex GROUP BY t),
        total AS (SELECT sum(cnt) AS tot FROM vocab),
        scored AS (
            SELECT id, -ln(cnt / tot) AS nlp
            FROM ex JOIN vocab USING (t) CROSS JOIN total
        ),
        per AS (
            SELECT id, count(*) AS n, round(avg(nlp), 6) AS avg_neg_logp
            FROM scored GROUP BY id
        )
        SELECT d.doc_id AS id,
               coalesce(per.n, 0) AS n_tokens,
               per.avg_neg_logp
        FROM documents d LEFT JOIN per ON per.id = d.doc_id
        ORDER BY id
    """,
    "tx_line_dedup": """
        WITH docs AS (
            SELECT doc_id AS id,
                   list_filter(
                       list_transform(
                           string_split(
                               regexp_replace(text, '((\\S+ ){3})',
                                              '\\1' || chr(10), 'g'),
                               chr(10)),
                           x -> trim(x)),
                       x -> len(x) > 0) AS lines
            FROM documents
        ),
        ex AS (SELECT id, unnest(lines) AS line FROM docs),
        freq AS (
            SELECT line FROM ex GROUP BY line HAVING count(DISTINCT id) > 1
        ),
        fs AS (SELECT coalesce(list(line), []) AS fl FROM freq),
        out AS (
            SELECT id, len(lines) AS n_total,
                   list_filter(lines, x -> NOT list_contains(fl, x)) AS keptl
            FROM docs CROSS JOIN fs
        )
        SELECT id,
               md5(coalesce(array_to_string(keptl, chr(10)), '')) AS clean_md5,
               len(keptl) AS n_lines_kept,
               n_total - len(keptl) AS n_lines_removed
        FROM out ORDER BY id
    """,
    "m18_roc_auc": f"""
        WITH {_AUC_BASE_SQL},
        per AS (SELECT s, count(*) AS c, sum(y) AS p FROM base GROUP BY s),
        ranked AS (
            SELECT *,
                   coalesce(sum(c) OVER (ORDER BY s
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS bef
            FROM per
        ),
        agg AS (
            SELECT sum(p * (bef + (c + 1) / 2.0)) AS rpos,
                   sum(p) AS pos, sum(c) - sum(p) AS neg
            FROM ranked
        )
        SELECT round((rpos - pos * (pos + 1) / 2.0)
                     / nullif(pos * neg, 0), 6) AS auc,
               CAST(pos AS BIGINT) AS n_pos,
               CAST(neg AS BIGINT) AS n_neg
        FROM agg
    """,
    "q_bm25": """
        WITH ex AS (
            SELECT doc_id AS id,
                   unnest(list_filter(
                       regexp_split_to_array(lower(text), '[ \\t\\n\\x0B\\f\\r]+'),
                       x -> len(x) > 0)) AS t
            FROM documents
        ),
        doclen AS (SELECT id, count(*) AS dl FROM ex GROUP BY id),
        stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM doclen),
        tf AS (
            SELECT id, t, count(*) AS tf FROM ex
            WHERE t IN ('query', 'join', 'stream') GROUP BY id, t
        ),
        dfreq AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
        scored AS (
            SELECT tf.id,
                   sum(ln(1 + (n - df + 0.5) / (df + 0.5))
                       * (tf * (1.2 + 1))
                       / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))) AS bm25
            FROM tf
            JOIN dfreq USING (t)
            JOIN doclen USING (id)
            CROSS JOIN stats
            GROUP BY tf.id
        )
        SELECT id, round(bm25, 6) AS bm25
        FROM scored ORDER BY round(bm25, 6) DESC, id ASC LIMIT 20
    """,
    "p24_spearman": """
        WITH base AS (
            SELECT l_quantity AS a, l_extendedprice AS b
            FROM lineitem
            WHERE (CASE WHEN l_orderkey % 10 = 3 THEN NULL
                        ELSE l_quantity END) IS NOT NULL
              AND l_extendedprice IS NOT NULL
        ),
        pa AS (SELECT a AS v, count(*) AS c FROM base GROUP BY a),
        ra AS (
            SELECT v, coalesce(sum(c) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                + (c + 1) / 2.0 AS r
            FROM pa
        ),
        pb AS (SELECT b AS v, count(*) AS c FROM base GROUP BY b),
        rb AS (
            SELECT v, coalesce(sum(c) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                + (c + 1) / 2.0 AS r
            FROM pb
        )
        SELECT round(corr(ra.r, rb.r), 6) AS spearman,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM base JOIN ra ON base.a = ra.v JOIN rb ON base.b = rb.v
    """,
    "e20_robust_scale": """
        WITH lin AS (
            SELECT l_orderkey, l_linenumber,
                   CASE WHEN l_orderkey % 10 = 3 THEN NULL
                        ELSE l_quantity END AS qty
            FROM lineitem
        ),
        q AS (
            SELECT quantile_cont(qty, 0.25) AS q1,
                   quantile_cont(qty, 0.5) AS med,
                   quantile_cont(qty, 0.75) AS q3
            FROM lin
        )
        SELECT l_orderkey, l_linenumber,
               round((qty - med) / nullif(q3 - q1, 0), 6) AS l_quantity_scaled
        FROM lin CROSS JOIN q
        ORDER BY l_orderkey, l_linenumber, l_quantity_scaled
    """,
    "m20_group_ttest": """
        WITH agg AS (
            SELECT sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS na,
                   sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS nb,
                   avg(CASE WHEN l_returnflag = 'A' THEN l_extendedprice END) AS ma,
                   avg(CASE WHEN l_returnflag = 'R' THEN l_extendedprice END) AS mb,
                   var_samp(CASE WHEN l_returnflag = 'A' THEN l_extendedprice END) AS va,
                   var_samp(CASE WHEN l_returnflag = 'R' THEN l_extendedprice END) AS vb
            FROM lineitem
            WHERE l_returnflag IN ('A', 'R') AND l_extendedprice IS NOT NULL
        )
        SELECT round((ma - mb) / sqrt(nullif(va / na + vb / nb, 0)), 6) AS t_stat,
               round(pow(va / na + vb / nb, 2)
                     / nullif(pow(va / na, 2) / nullif(na - 1, 0)
                              + pow(vb / nb, 2) / nullif(nb - 1, 0), 0),
                     6) AS welch_df,
               round(ma, 6) AS mean_a,
               round(mb, 6) AS mean_b,
               CAST(na AS BIGINT) AS n_a,
               CAST(nb AS BIGINT) AS n_b
        FROM agg
    """,
    "q_interval_join": """
        -- independent algorithm: each event's own day defines its user's
        -- [day, day+12h) interval, so interval membership == hour(ts) < 12
        SELECT user_id,
               count(*) AS n_events,
               CAST(sum(CASE WHEN extract('hour' FROM ts) < 12
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_first_half
        FROM events
        GROUP BY user_id
        ORDER BY user_id
    """,
    "f9_align_columns": """
        SELECT CAST(NULL AS DOUBLE) AS name_as_double,
               CAST(c_custkey AS VARCHAR) AS custkey_str,
               round(c_acctbal, 2) AS c_acctbal
        FROM customer
        ORDER BY custkey_str
    """,
    "s3_csv_strings": """
        SELECT CAST(o_orderkey AS VARCHAR) AS o_orderkey,
               o_orderstatus,
               CASE WHEN o_orderkey % 7 = 2 THEN ''
                    ELSE o_orderpriority END AS o_orderpriority
        FROM orders
        ORDER BY o_orderkey
    """,
    "p25_approx_distinct_quality": """
        SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_partkey,
               TRUE AS partkey_ok,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS exact_suppkey,
               TRUE AS suppkey_ok
        FROM lineitem
    """,
    "q_ewma": """
        WITH daily AS (
            SELECT l_returnflag, strftime(l_shipdate, '%Y-%m-%d') AS d,
                   sum(l_quantity) AS x
            FROM lineitem GROUP BY 1, 2
        ),
        numbered AS (
            SELECT l_returnflag, x,
                   row_number() OVER (PARTITION BY l_returnflag ORDER BY d) AS n,
                   count(*) OVER (PARTITION BY l_returnflag) AS nn
            FROM daily
        )
        SELECT l_returnflag,
               CAST(max(nn) AS BIGINT) AS n_points,
               round(sum(CASE WHEN n = 1 THEN pow(0.7, nn - 1) * x
                              ELSE 0.3 * pow(0.7, nn - n) * x END), 6) AS ewma
        FROM numbered
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "s16_scd2": """
        WITH cust AS (
            SELECT c_custkey, round(c_acctbal, 2) AS acctbal FROM customer
        ),
        upd AS (
            SELECT o_custkey AS c_custkey,
                   round(max(o_totalprice), 2) AS acctbal,
                   strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') AS eff
            FROM orders GROUP BY o_custkey
        ),
        closed AS (
            SELECT c.c_custkey, c.acctbal,
                   '1992-01-01 00:00:00' AS valid_from,
                   coalesce(u.eff, '9999-12-31 00:00:00') AS valid_to
            FROM cust c LEFT JOIN upd u ON c.c_custkey = u.c_custkey
        ),
        opened AS (
            SELECT c_custkey, acctbal, eff AS valid_from,
                   '9999-12-31 00:00:00' AS valid_to
            FROM upd
        )
        SELECT * FROM closed
        UNION ALL
        SELECT * FROM opened
        ORDER BY c_custkey, valid_from
    """,
    "e21_group_scale": """
        WITH stats AS (
            SELECT l_returnflag, min(l_quantity) AS mn, max(l_quantity) AS mx
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
               round((l.l_quantity - s.mn) / nullif(s.mx - s.mn, 0), 6) AS q_scaled
        FROM lineitem l JOIN stats s ON l.l_returnflag = s.l_returnflag
        ORDER BY l.l_orderkey, l.l_linenumber, l.l_returnflag, q_scaled
    """,
    "q_recency_features": """
        WITH ref AS (SELECT max(ts) AS r FROM events)
        SELECT user_id,
               CAST(min(datediff('day', ts, r)) AS BIGINT) AS days_since_last,
               count(*) AS n_events,
               CAST(sum(CASE WHEN datediff('day', ts, r) < 7
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_7d,
               CAST(sum(CASE WHEN datediff('day', ts, r) < 30
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_30d,
               count(DISTINCT CAST(ts AS DATE)) AS n_active_days
        FROM events CROSS JOIN ref
        GROUP BY user_id
        ORDER BY user_id
    """,
    "t10_group_sample": """
        WITH ranked AS (
            SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS c_acctbal,
                   row_number() OVER (
                       PARTITION BY c_mktsegment
                       ORDER BY md5('r3' || '|' || CAST(c_custkey AS VARCHAR)),
                                CAST(c_custkey AS VARCHAR)
                   ) AS rn
            FROM customer
        )
        SELECT c_custkey, c_mktsegment, c_acctbal
        FROM ranked WHERE rn <= 20
        ORDER BY c_mktsegment, c_custkey
    """,
    "q_sql_surface": """
        WITH ranked AS (
            SELECT o_custkey, o_totalprice,
                   row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey
                   ) AS rn
            FROM orders
        )
        SELECT c.c_mktsegment,
               count(*) AS n_customers,
               round(sum(r.o_totalprice), 2) AS top_order_revenue
        FROM ranked r
        JOIN customer c ON r.o_custkey = c.c_custkey
        WHERE r.rn = 1
        GROUP BY c.c_mktsegment
        ORDER BY c.c_mktsegment
    """,
    "p23_ks_drift": """
        WITH per AS (
            SELECT l_quantity AS v,
                   sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS ca,
                   sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS cb
            FROM lineitem
            WHERE l_returnflag IN ('A', 'R')
            GROUP BY l_quantity
        ),
        cum AS (
            SELECT sum(ca) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
                   sum(cb) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b,
                   sum(ca) OVER () AS na,
                   sum(cb) OVER () AS nb
            FROM per
        )
        SELECT round(max(abs(cum_a / CAST(na AS DOUBLE)
                             - cum_b / CAST(nb AS DOUBLE))), 6) AS ks_stat,
               CAST(max(na) AS BIGINT) AS n_a,
               CAST(max(nb) AS BIGINT) AS n_b
        FROM cum
    """,
    "st_enriched_segments": """
        SELECT coalesce(c.c_mktsegment, 'UNKNOWN') AS segment,
               count(*) AS n_events,
               round(sum(e.value), 6) AS total_value
        FROM events e
        LEFT JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY 1
        ORDER BY 1
    """,
    "m21_pr_points": f"""
        WITH {_AUC_BASE_SQL},
        per AS (SELECT s AS score, count(*) AS c, sum(y) AS p
                FROM base GROUP BY s),
        cum AS (
            SELECT score,
                   sum(p) OVER (ORDER BY score DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_p,
                   sum(c) OVER (ORDER BY score DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_c,
                   sum(p) OVER () AS pos
            FROM per
        )
        SELECT score AS threshold,
               round(cum_p / CAST(cum_c AS DOUBLE), 6) AS precision,
               round(cum_p / CAST(nullif(pos, 0) AS DOUBLE), 6) AS recall
        FROM cum ORDER BY threshold DESC
    """,
    "m22_brier_logloss": f"""
        WITH {_AUC_BASE_SQL},
        clamped AS (
            SELECT y, greatest(0.000001, least(0.999999, s)) AS p
            FROM base WHERE y IS NOT NULL
        )
        SELECT round(avg((p - y) * (p - y)), 6) AS brier,
               round(-avg(y * ln(p) + (1 - y) * ln(1 - p)), 6) AS log_loss,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM clamped
    """,
    "m19_roc_points": f"""
        WITH {_AUC_BASE_SQL},
        per AS (SELECT s AS score, count(*) AS c, sum(y) AS p
                FROM base GROUP BY s),
        cum AS (
            SELECT score,
                   sum(p) OVER (ORDER BY score DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_p,
                   sum(c - p) OVER (ORDER BY score DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
                   sum(p) OVER () AS pos,
                   sum(c - p) OVER () AS neg
            FROM per
        )
        SELECT score AS threshold,
               round(cum_n / CAST(nullif(neg, 0) AS DOUBLE), 6) AS fpr,
               round(cum_p / CAST(nullif(pos, 0) AS DOUBLE), 6) AS tpr
        FROM cum ORDER BY threshold DESC
    """,
    "q7_volume_shipping": """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INTEGER) AS l_year,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        GROUP BY 1, 2, 3
        ORDER BY 1, 2, 3
    """,
    "q8_market_share": """
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
               round(sum(CASE WHEN sn.n_name = 'NATION_5'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END)
                     / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region ON cn.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE p_type = 'STANDARD' AND r_name = 'AMERICA'
        GROUP BY 1
        ORDER BY 1
    """,
    "q9_profit_by_nation": """
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS INTEGER) AS o_year,
               -- exact BIGINT 1e-4-unit sum: order-independent across
               -- engines, no half-cent half-up/half-even divergence
               round(sum(CAST(round((l_extendedprice * (1 - l_discount)
                         - 0.5 * p_retailprice * l_quantity) * 10000) AS BIGINT))
                     / 10000.0, 2) AS sum_profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_type = 'ECONOMY'
        GROUP BY 1, 2
        ORDER BY nation, o_year DESC
    """,
    "q13_order_distribution": """
        SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        FROM (
            SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
            FROM customer
            LEFT JOIN (SELECT * FROM orders WHERE o_orderpriority <> '1-URGENT') o
              ON c_custkey = o.o_custkey
            GROUP BY c_custkey
        )
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    "q15_top_supplier": """
        WITH rev AS (
            SELECT l_suppkey,
                   sum(l_extendedprice * (1 - l_discount)) AS total
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1997-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, round(total, 2) AS total_revenue
        FROM rev
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE total = (SELECT max(total) FROM rev)
        ORDER BY s_suppkey
    """,
    "q16_supplier_part_counts": """
        SELECT p_brand, p_type, p_size,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_type NOT IN ('PROMO')
          AND p_size IN (1, 5, 10, 15, 20, 25)
        GROUP BY 1, 2, 3
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    "q17_small_qty_revenue": """
        WITH branded AS (
            SELECT l_partkey, l_quantity, l_extendedprice
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand = 'Brand#3'
        ),
        qbar AS (
            SELECT l_partkey AS pk, 0.2 * avg(l_quantity) AS q
            FROM branded GROUP BY 1
        )
        SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
               CAST(count(*) AS BIGINT) AS n_items
        FROM branded JOIN qbar ON l_partkey = pk
        WHERE l_quantity < q
    """,
    "q22_dormant_customers": """
        SELECT c_nationkey,
               CAST(count(*) AS BIGINT) AS numcust,
               round(sum(c_acctbal), 2) AS totacctbal
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '1999-01-01')
        GROUP BY c_nationkey
        ORDER BY c_nationkey
    """,
    "m24_confusion_matrix": """
        -- accuracy + support-weighted precision/recall/F1 from first
        -- principles (MLlib weightedPrecision/weightedRecall/f1 semantics:
        -- per-class metric weighted by TRUE-label support; 0 on 0/0)
        WITH preds AS (
            SELECT CAST(c_custkey % 3 AS DOUBLE) AS y,
                   CAST((c_custkey + CASE WHEN c_acctbal > 5000 THEN 1 ELSE 0 END) % 3
                        AS DOUBLE) AS p
            FROM customer
        ),
        cls AS (SELECT DISTINCT y AS c FROM preds),
        per AS (
            SELECT c,
                   sum(CASE WHEN y = c AND p = c THEN 1 ELSE 0 END) AS tp,
                   sum(CASE WHEN y <> c AND p = c THEN 1 ELSE 0 END) AS fp,
                   sum(CASE WHEN y = c AND p <> c THEN 1 ELSE 0 END) AS fn,
                   sum(CASE WHEN y = c THEN 1 ELSE 0 END) AS support
            FROM cls CROSS JOIN preds
            GROUP BY c
        ),
        rates AS (
            SELECT c, support,
                   CASE WHEN tp + fp = 0 THEN 0.0 ELSE tp * 1.0 / (tp + fp) END AS prec,
                   CASE WHEN tp + fn = 0 THEN 0.0 ELSE tp * 1.0 / (tp + fn) END AS rec
            FROM per
        )
        SELECT round((SELECT sum(CASE WHEN y = p THEN 1 ELSE 0 END) * 1.0 / count(*)
                      FROM preds), 6) AS accuracy,
               round(sum(support * prec) / sum(support), 6) AS precision,
               round(sum(support * rec) / sum(support), 6) AS recall,
               round(sum(support * (CASE WHEN prec + rec = 0 THEN 0.0
                         ELSE 2 * prec * rec / (prec + rec) END)) / sum(support), 6) AS f1
        FROM rates
    """,
    "m25_regression_metrics": """
        WITH preds AS (
            SELECT o_totalprice / 1000.0 AS y,
                   (o_totalprice / 1000.0) * 0.9 + 50.0 AS p
            FROM orders
        ),
        stats AS (SELECT avg(y) AS ybar FROM preds)
        SELECT round(1.0 - sum((y - p) * (y - p))
                         / sum((y - ybar) * (y - ybar)), 6) AS r2,
               round(avg((y - p) * (y - p)), 6) AS mse,
               round(avg(abs(y - p)), 6) AS mae
        FROM preds CROSS JOIN stats
    """,
    "tx_url_canonicalize": """
        WITH urls AS (
            SELECT doc_id,
                   CASE CAST(doc_id % 4 AS INT)
                     WHEN 0 THEN 'https://www.site' || CAST(doc_id % 23 AS VARCHAR)
                          || '.example.test/page' || CAST(doc_id AS VARCHAR)
                          || '/?utm_source=x&b=2&a=1#frag'
                     WHEN 1 THEN 'HTTPS://Site' || CAST(doc_id % 23 AS VARCHAR)
                          || '.Example.TEST:443/page' || CAST(doc_id AS VARCHAR)
                     WHEN 2 THEN 'http://site' || CAST(doc_id % 23 AS VARCHAR)
                          || '.example.test/page' || CAST(doc_id AS VARCHAR)
                          || '?a=1&utm_campaign=z&ref=abc'
                     ELSE 'ftp://site' || CAST(doc_id % 23 AS VARCHAR) || '.example.test/x'
                   END AS url
            FROM documents
        ),
        parts AS (
            SELECT doc_id, url,
                   lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
                   CASE lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
                     WHEN 'http' THEN regexp_replace(regexp_replace(
                       lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)),
                       '^www\\.', ''), ':80$', '')
                     WHEN 'https' THEN regexp_replace(regexp_replace(
                       lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)),
                       '^www\\.', ''), ':443$', '')
                     ELSE regexp_replace(
                       lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)),
                       '^www\\.', '')
                   END AS host,
                   regexp_replace(
                       regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1),
                       '/+$', '') AS path0,
                   regexp_extract(url, '^[^#]*\\?([^#]*)', 1) AS rawq
            FROM urls
        ),
        canon AS (
            SELECT doc_id, scheme, host,
                   CASE WHEN path0 = '' THEN '/' ELSE path0 END AS path,
                   array_to_string(list_sort(list_filter(string_split(rawq, '&'),
                       p -> len(p) > 0 AND NOT regexp_matches(p, '^(utm_[a-z]+|gclid|fbclid|ref)='))),
                       '&') AS qs
            FROM parts
        )
        SELECT doc_id,
               CASE WHEN scheme IN ('http', 'https') AND host <> '' THEN
                   scheme || '://' || host || path
                   || CASE WHEN qs <> '' THEN '?' || qs ELSE '' END
               END AS canonical_url
        FROM canon
        ORDER BY doc_id
    """,
    "tx_blocklist_filter": """
        WITH urls AS (
            SELECT doc_id,
                   CASE CAST(doc_id % 4 AS INT)
                     WHEN 0 THEN 'site' || CAST(doc_id % 23 AS VARCHAR) || '.example.test'
                     WHEN 1 THEN 'site' || CAST(doc_id % 23 AS VARCHAR) || '.example.test'
                     WHEN 2 THEN 'site' || CAST(doc_id % 23 AS VARCHAR) || '.example.test'
                   END AS domain
            FROM documents
        )
        SELECT domain, CAST(count(*) AS BIGINT) AS n_docs
        FROM urls
        WHERE domain IS NOT NULL
          AND domain NOT IN ('site1.example.test', 'site5.example.test', 'site9.example.test')
        GROUP BY domain
        ORDER BY domain
    """,
    "tx_script_stats": """
        WITH injected AS (
            SELECT doc_id,
                   text || ' ' || CASE CAST(doc_id % 4 AS INT)
                       WHEN 1 THEN 'привет мир это тест'
                       WHEN 2 THEN '你好世界这是测试'
                       WHEN 3 THEN 'مرحبا بالعالم هذا اختبار'
                       ELSE '' END AS text
            FROM documents
        ),
        counted AS (
            SELECT doc_id,
                   length(regexp_replace(text, '[ \\t\\n\\x0B\\f\\r]', '', 'g')) AS total,
                   length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS n_latin,
                   length(text) - length(regexp_replace(text, '[Ѐ-ӿ]', '', 'g')) AS n_cyr,
                   length(text) - length(regexp_replace(text, '[一-鿿]', '', 'g')) AS n_cjk,
                   length(text) - length(regexp_replace(text, '[؀-ۿ]', '', 'g')) AS n_ar,
                   length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_dig
            FROM injected
        ),
        fr AS (
            SELECT doc_id,
                   coalesce(round(n_latin * 1.0 / nullif(total, 0), 6), 0.0) AS frac_latin,
                   coalesce(round(n_cyr * 1.0 / nullif(total, 0), 6), 0.0) AS frac_cyrillic,
                   coalesce(round(n_cjk * 1.0 / nullif(total, 0), 6), 0.0) AS frac_cjk,
                   coalesce(round(n_ar * 1.0 / nullif(total, 0), 6), 0.0) AS frac_arabic,
                   coalesce(round(n_dig * 1.0 / nullif(total, 0), 6), 0.0) AS frac_digit
            FROM counted
        )
        SELECT doc_id, frac_latin, frac_cyrillic, frac_cjk, frac_arabic, frac_digit,
               -- Spark side = array_max over struct(frac, name): ties on
               -- frac break to the lexicographically GREATEST script name
               -- (latin > digit > cyrillic > cjk > arabic)
               CASE WHEN greatest(frac_latin, frac_cyrillic, frac_cjk, frac_arabic, frac_digit) <= 0
                        THEN 'other'
                    WHEN frac_latin >= greatest(frac_cyrillic, frac_cjk, frac_arabic, frac_digit)
                        THEN 'latin'
                    WHEN frac_digit >= greatest(frac_cyrillic, frac_cjk, frac_arabic)
                        THEN 'digit'
                    WHEN frac_cyrillic >= greatest(frac_cjk, frac_arabic)
                        THEN 'cyrillic'
                    WHEN frac_cjk >= frac_arabic
                        THEN 'cjk'
                    ELSE 'arabic'
               END AS dominant_script
        FROM fr
        ORDER BY doc_id
    """,
    "e22_woe_encode": """
        WITH base AS (
            SELECT c_mktsegment,
                   CASE WHEN c_acctbal > 0 THEN 1.0 ELSE 0.0 END AS y
            FROM customer
        ),
        per AS (
            SELECT c_mktsegment, sum(y) AS pos, sum(1 - y) AS neg,
                   count(*) AS n_rows
            FROM base GROUP BY 1
        ),
        tot AS (SELECT sum(pos) AS ptot, sum(neg) AS ntot, count(*) AS k FROM per)
        SELECT c_mktsegment,
               round(ln(((pos + 0.5) / (ptot + 0.5 * k))
                        / ((neg + 0.5) / (ntot + 0.5 * k))), 6) AS woe,
               CAST(n_rows AS BIGINT) AS n_rows
        FROM per CROSS JOIN tot
        ORDER BY c_mktsegment
    """,
    "p26_k_anonymity": """
        WITH classes AS (
            SELECT c_nationkey, c_mktsegment, count(*) AS n
            FROM customer GROUP BY 1, 2
        )
        SELECT CAST(count(*) AS BIGINT) AS n_classes,
               CAST(min(n) AS BIGINT) AS anonymity_k,
               CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT) AS classes_below_k,
               CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT) AS rows_below_k,
               CAST(sum(n) AS BIGINT) AS n_rows
        FROM classes
    """,
    "e23_information_value": """
        WITH base AS (
            SELECT c_mktsegment,
                   CASE WHEN c_acctbal > 0 THEN 1.0 ELSE 0.0 END AS y
            FROM customer
        ),
        per AS (
            SELECT c_mktsegment, sum(y) AS pos, sum(1 - y) AS neg
            FROM base GROUP BY 1
        ),
        tot AS (SELECT sum(pos) AS pt, sum(neg) AS nt, count(*) AS k FROM per)
        SELECT round(sum((pos / pt - neg / nt)
                         * ln(((pos + 0.5) / (pt + 0.5 * k))
                              / ((neg + 0.5) / (nt + 0.5 * k)))), 6)
                   AS information_value,
               CAST(count(*) AS BIGINT) AS n_categories
        FROM per CROSS JOIN tot
    """,
    "q_gini": """
        WITH per AS (
            SELECT o_custkey,
                   CAST(round(sum(o_totalprice)) AS BIGINT) AS rev
            FROM orders GROUP BY 1
        ),
        ranked AS (
            SELECT rev,
                   row_number() OVER (ORDER BY rev, o_custkey) AS i,
                   count(*) OVER () AS n
            FROM per
        )
        SELECT round(2.0 * sum(i * rev) / (max(n) * sum(rev))
                     - (max(n) + 1.0) / max(n), 6) AS gini,
               CAST(max(n) AS BIGINT) AS n_customers
        FROM ranked
    """,
    "p28_moments": """
        WITH base AS (
            SELECT CAST(l_quantity AS BIGINT) AS qty,
                   CAST(round(l_discount * 100) AS BIGINT) AS disc_cents
            FROM lineitem
        ),
        s AS (
            SELECT CAST(count(*) AS DOUBLE) AS n,
                   CAST(sum(qty) AS DOUBLE) AS q1, CAST(sum(qty*qty) AS DOUBLE) AS q2,
                   CAST(sum(qty*qty*qty) AS DOUBLE) AS q3,
                   CAST(sum(qty*qty*qty*qty) AS DOUBLE) AS q4,
                   CAST(sum(disc_cents) AS DOUBLE) AS d1,
                   CAST(sum(disc_cents*disc_cents) AS DOUBLE) AS d2,
                   CAST(sum(disc_cents*disc_cents*disc_cents) AS DOUBLE) AS d3,
                   CAST(sum(disc_cents*disc_cents*disc_cents*disc_cents) AS DOUBLE) AS d4
            FROM base
        ),
        m AS (
            SELECT n,
                   q1/n AS qm, q2/n - (q1/n)*(q1/n) AS qm2,
                   q3/n - 3*(q1/n)*q2/n + 2*(q1/n)*(q1/n)*(q1/n) AS qm3,
                   q4/n - 4*(q1/n)*q3/n + 6*(q1/n)*(q1/n)*q2/n
                        - 3*(q1/n)*(q1/n)*(q1/n)*(q1/n) AS qm4,
                   d1/n AS dm, d2/n - (d1/n)*(d1/n) AS dm2,
                   d3/n - 3*(d1/n)*d2/n + 2*(d1/n)*(d1/n)*(d1/n) AS dm3,
                   d4/n - 4*(d1/n)*d3/n + 6*(d1/n)*(d1/n)*d2/n
                        - 3*(d1/n)*(d1/n)*(d1/n)*(d1/n) AS dm4
            FROM s
        )
        SELECT round(qm, 6) AS qty_mean,
               round(sqrt(qm2), 6) AS qty_std,
               round(qm3 / pow(qm2, 1.5), 6) AS qty_skewness,
               round(qm4 / (qm2 * qm2) - 3, 6) AS qty_kurtosis,
               round(dm, 6) AS disc_cents_mean,
               round(sqrt(dm2), 6) AS disc_cents_std,
               round(dm3 / pow(dm2, 1.5), 6) AS disc_cents_skewness,
               round(dm4 / (dm2 * dm2) - 3, 6) AS disc_cents_kurtosis
        FROM m
    """,
    "tx_vocab_overlap": f"""
        WITH vocab AS (
            SELECT DISTINCT source AS src, unnest({_TOKS}) AS tok
            FROM documents
        ),
        sizes AS (SELECT src, count(*) AS n_vocab FROM vocab GROUP BY 1),
        inter AS (
            SELECT a.src AS src_a, b.src AS src_b, count(*) AS n_shared
            FROM vocab a JOIN vocab b ON a.tok = b.tok AND a.src < b.src
            GROUP BY 1, 2
        )
        SELECT src_a, src_b, CAST(n_shared AS BIGINT) AS n_shared,
               round(n_shared * 1.0 / (na.n_vocab + nb.n_vocab - n_shared), 6)
                   AS vocab_jaccard
        FROM inter
        JOIN sizes na ON na.src = src_a
        JOIN sizes nb ON nb.src = src_b
        ORDER BY vocab_jaccard DESC, src_a, src_b
        LIMIT 25
    """,
    "t12_group_weighted_sample": """
        WITH keyed AS (
            SELECT doc_id, source, n_chars,
                   -- same w <= 0 guard as the engine: non-positive weights
                   -- key to NULL and sort after every valid row
                   CASE WHEN n_chars > 0 THEN
                     pow((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':11'), 1, 15)
                               AS BIGINT) + 0.5) / 1152921504606846976.0,
                         1.0 / n_chars)
                   END AS akey
            FROM documents
        ),
        ranked AS (
            SELECT doc_id, source, n_chars,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY akey DESC NULLS LAST, doc_id) AS rn
            FROM keyed
        )
        SELECT doc_id, source, n_chars
        FROM ranked WHERE rn <= 3
        ORDER BY source, doc_id
    """,
    "tx_temperature_mix": f"""
        WITH inv AS (
            SELECT source, CAST(sum(len({_TOKS})) AS BIGINT) AS available_tokens
            FROM documents GROUP BY 1
        ),
        pw AS (SELECT source, available_tokens,
                      pow(CAST(available_tokens AS DOUBLE), 0.5) AS p
               FROM inv),
        tot AS (SELECT sum(p) AS t FROM pw)
        SELECT source, available_tokens, round(p / t, 6) AS weight
        FROM pw CROSS JOIN tot
        ORDER BY source
    """,
    "s18_schema_diff": """
        SELECT * FROM (VALUES
            ('o_channel',    'added',     CAST(NULL AS VARCHAR), 'string'),
            ('o_orderkey',   'unchanged', 'bigint',              'bigint'),
            ('o_orderstatus','removed',   'string',              CAST(NULL AS VARCHAR)),
            ('o_totalprice', 'retyped',   'double',              'string')
        ) AS t(\"column\", status, old_type, new_type)
        ORDER BY \"column\"
    """,
    "q_abc_brands": """
        WITH rev AS (
            SELECT p_brand,
                   CAST(round(sum(l_extendedprice * (1 - l_discount))) AS BIGINT) AS rev
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY 1
        ),
        cum AS (
            SELECT p_brand, rev,
                   round(sum(rev) OVER (ORDER BY rev DESC, p_brand
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         * 1.0 / sum(rev) OVER (), 6) AS cum_share
            FROM rev
        )
        SELECT p_brand, rev, cum_share,
               CASE WHEN cum_share <= 0.7 THEN 'A'
                    WHEN cum_share <= 0.9 THEN 'B'
                    ELSE 'C' END AS abc_class
        FROM cum
        ORDER BY rev DESC, p_brand
    """,
    "q_rfm_segments": """
        WITH per AS (
            SELECT o_custkey,
                   date_diff('day', DATE '1970-01-01', CAST(max(o_orderdate) AS DATE)) AS last_day,
                   count(*) AS freq,
                   CAST(round(sum(o_totalprice)) AS BIGINT) AS mon
            FROM orders GROUP BY 1
        ),
        n AS (SELECT count(*) AS nt FROM per),
        scored AS (
            SELECT
              CAST(floor((row_number() OVER (ORDER BY last_day, o_custkey) - 1) * 5 / nt) + 1 AS INT) AS r_score,
              CAST(floor((row_number() OVER (ORDER BY freq, o_custkey) - 1) * 5 / nt) + 1 AS INT) AS f_score,
              CAST(floor((row_number() OVER (ORDER BY mon, o_custkey) - 1) * 5 / nt) + 1 AS INT) AS m_score
            FROM per CROSS JOIN n
        )
        SELECT r_score, f_score, m_score, CAST(count(*) AS BIGINT) AS n_customers
        FROM scored
        GROUP BY 1, 2, 3
        ORDER BY 1, 2, 3
    """,
    "q_basket_lift": """
        WITH ib AS (
            SELECT DISTINCT l_orderkey AS o, p_brand AS b
            FROM lineitem JOIN part ON l_partkey = p_partkey
        ),
        pair_n AS (
            SELECT a.b AS ba, bj.b AS bb, count(*) AS n_ab
            FROM ib a JOIN ib bj ON a.o = bj.o AND a.b < bj.b
            GROUP BY 1, 2
        ),
        brand_n AS (SELECT b, count(*) AS n_b FROM ib GROUP BY 1),
        tot AS (SELECT count(DISTINCT o) AS n_orders FROM ib)
        SELECT ba, bb, CAST(n_ab AS BIGINT) AS n_ab,
               round(n_ab * 1.0 / n_orders, 6) AS support,
               round(n_ab * 1.0 / na.n_b, 6) AS confidence,
               round(n_ab * 1.0 * n_orders / (na.n_b * nb.n_b), 6) AS lift
        FROM pair_n
        JOIN brand_n na ON na.b = ba
        JOIN brand_n nb ON nb.b = bb
        CROSS JOIN tot
        ORDER BY lift DESC, ba, bb
        LIMIT 20
    """,
    "q_twap": """
        WITH uniq AS (
            SELECT user_id, ts, avg(value) AS value
            FROM events GROUP BY 1, 2
        ),
        iv AS (
            SELECT user_id, value,
                   CAST(lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts)
                        - epoch_us(ts) AS DOUBLE) AS w
            FROM uniq
        )
        SELECT user_id,
               round(sum(w * value) / nullif(sum(w), 0.0), 6) AS twap,
               CAST(count(*) AS BIGINT) AS n_obs
        FROM iv
        GROUP BY user_id
        ORDER BY user_id
    """,
    "p27_benford": """
        WITH digits AS (
            SELECT CAST(substr(CAST(CAST(floor(abs(o_totalprice)) AS BIGINT) AS VARCHAR), 1, 1)
                        AS INT) AS digit
            FROM orders
            WHERE CAST(floor(abs(o_totalprice)) AS BIGINT) >= 1
        ),
        per AS (SELECT digit, count(*) AS n FROM digits GROUP BY 1),
        tot AS (SELECT sum(n) AS t FROM per)
        SELECT digit, CAST(n AS BIGINT) AS n,
               round(n * 1.0 / t, 6) AS observed,
               round(log10(1.0 + 1.0 / digit), 6) AS benford,
               round(n * 1.0 / t - log10(1.0 + 1.0 / digit), 6) AS deviation
        FROM per CROSS JOIN tot
        ORDER BY digit
    """,
    "pipe_web_hygiene": """
        -- canonical form of the injected URL is derivable in closed form:
        -- scheme https, www stripped, host lowered, utm_source dropped,
        -- v=1 kept → https://site{d%23}.example.test/doc/{d%7}?v=1
        WITH canon AS (
            SELECT doc_id,
                   'site' || CAST(doc_id % 23 AS VARCHAR) || '.example.test' AS domain,
                   'https://site' || CAST(doc_id % 23 AS VARCHAR)
                       || '.example.test/doc/' || CAST(doc_id % 7 AS VARCHAR)
                       || '?v=1' AS canonical_url
            FROM documents
        ),
        surviving AS (
            SELECT * FROM canon
            WHERE domain NOT IN ('site3.example.test', 'site17.example.test')
        ),
        deduped AS (
            SELECT canonical_url, domain,
                   min(doc_id) AS survivor_id, count(*) AS n_dups
            FROM surviving
            GROUP BY 1, 2
        )
        SELECT domain,
               CAST(count(*) AS BIGINT) AS n_urls,
               CAST(sum(n_dups) AS BIGINT) AS n_docs,
               CAST(min(survivor_id) AS BIGINT) AS first_survivor
        FROM deduped
        GROUP BY domain
        ORDER BY domain
    """,
    "t11_weighted_sample": """
        WITH keyed AS (
            SELECT doc_id, n_chars,
                   -- same w <= 0 guard as the engine: non-positive weights
                   -- key to NULL and sort after every valid row
                   CASE WHEN n_chars > 0 THEN
                     pow((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':7'), 1, 15)
                               AS BIGINT) + 0.5) / 1152921504606846976.0,
                         1.0 / n_chars)
                   END AS k
            FROM documents
        )
        SELECT doc_id, n_chars, round(k, 6) AS wkey
        FROM keyed
        ORDER BY k DESC NULLS LAST, doc_id
        LIMIT 50
    """,
    "dd_incremental_pairs": f"""
        -- FULL recompute of exact 3-gram Jaccard pairs, filtered to pairs
        -- with a batch member (doc_id >= 400): the incremental operator
        -- must equal this exactly (no lost pairs, no phantom pairs)
        WITH {_NGRAM_PAIRS_J}
        SELECT id_a, id_b, jaccard
        FROM j
        WHERE jaccard >= 0.2 AND (id_a >= 400 OR id_b >= 400)
        ORDER BY id_a, id_b
    """,
    "s17_zorder_layout": f"""
        WITH dims AS (
            SELECT CAST(l_orderkey % 256 AS BIGINT) AS x,
                   CAST(l_partkey % 256 AS BIGINT) AS y
            FROM lineitem
        ),
        keyed AS (SELECT x, y, ({_ZKEY_8}) AS zkey FROM dims)
        SELECT CAST(zkey // 256 AS BIGINT) AS zblock,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(min(x) AS BIGINT) AS x_min, CAST(max(x) AS BIGINT) AS x_max,
               CAST(min(y) AS BIGINT) AS y_min, CAST(max(y) AS BIGINT) AS y_max
        FROM keyed
        GROUP BY 1
        ORDER BY zblock
    """,
    "tx_span_dedup": """
        -- ExactSubstr-style span dedup, width=15, min_docs=2. Windows are
        -- keyed on their TEXT (Spark uses xxhash64 of the same text).
        WITH t AS (
            SELECT doc_id AS id,
                   list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+'),
                               x -> len(x) > 0) AS toks
            FROM documents
        ),
        wins AS (
            SELECT id, i AS s,
                   array_to_string(list_slice(toks, i, i + 14), ' ') AS win
            FROM t, unnest(generate_series(1, len(toks) - 14)) AS g(i)
            WHERE len(toks) >= 15
        ),
        freq AS (
            SELECT win FROM wins GROUP BY win HAVING count(DISTINCT id) >= 2
        ),
        rep AS (SELECT id, s FROM wins JOIN freq USING (win)),
        isl AS (
            SELECT id, s,
                   CASE WHEN s > coalesce(max(s + 15) OVER (
                            PARTITION BY id ORDER BY s
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) THEN 1 ELSE 0 END AS nw
            FROM rep
        ),
        isl2 AS (
            SELECT id, s, sum(nw) OVER (PARTITION BY id ORDER BY s) AS grp
            FROM isl
        ),
        spans AS (
            SELECT id, grp, min(s) AS st, max(s) + 15 AS en
            FROM isl2 GROUP BY id, grp
        ),
        covered AS (
            SELECT DISTINCT id, p
            FROM spans, unnest(generate_series(st, en - 1)) AS c(p)
        ),
        tokpos AS (
            SELECT id, i AS pos, toks[i] AS tok
            FROM t, unnest(generate_series(1, len(toks))) AS g(i)
        ),
        kept AS (
            SELECT tp.id, tp.pos, tp.tok
            FROM tokpos tp
            ANTI JOIN covered c ON c.id = tp.id AND c.p = tp.pos
        ),
        nt AS (SELECT id, count(*) AS n_tokens FROM tokpos GROUP BY id),
        ns AS (SELECT id, count(*) AS n_spans FROM spans GROUP BY id),
        rb AS (
            SELECT id, count(*) AS n_kept,
                   string_agg(tok, ' ' ORDER BY pos) AS text_clean
            FROM kept GROUP BY id
        )
        SELECT d.doc_id AS id,
               coalesce(nt.n_tokens, 0) AS n_tokens,
               coalesce(nt.n_tokens, 0) - coalesce(rb.n_kept, 0) AS n_tokens_removed,
               coalesce(ns.n_spans, 0) AS n_spans,
               md5(coalesce(rb.text_clean, '')) AS clean_md5
        FROM documents d
        LEFT JOIN nt ON nt.id = d.doc_id
        LEFT JOIN ns ON ns.id = d.doc_id
        LEFT JOIN rb ON rb.id = d.doc_id
        ORDER BY id
    """,
    "tx_dsir_select": """
        -- DSIR unigram importance weights: target = lang='en' docs,
        -- raw = all docs; add-1 Laplace over the raw vocabulary.
        WITH toks AS (
            SELECT doc_id AS id,
                   CAST(lang = 'en' AS INT) AS t,
                   unnest(list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+'),
                                      x -> len(x) > 0)) AS tok
            FROM documents
        ),
        stats AS (
            SELECT tok,
                   CAST(sum(t) AS BIGINT) AS ct,
                   CAST(count(*) AS BIGINT) AS cr
            FROM toks GROUP BY tok
        ),
        tot AS (
            SELECT CAST(sum(ct) AS DOUBLE) AS nt,
                   CAST(sum(cr) AS DOUBLE) AS nr,
                   CAST(count(*) AS DOUBLE) AS v
            FROM stats
        ),
        lr AS (
            SELECT tok,
                   ln((ct + 1.0) / (nt + v)) - ln((cr + 1.0) / (nr + v)) AS lr
            FROM stats CROSS JOIN tot
        ),
        per AS (
            SELECT toks.id,
                   CAST(count(*) AS BIGINT) AS n_tokens,
                   sum(lr.lr) / count(*) AS w
            FROM toks JOIN lr USING (tok)
            GROUP BY toks.id
        ),
        full_set AS (
            SELECT d.doc_id AS id,
                   coalesce(per.n_tokens, 0) AS n_tokens,
                   round(per.w, 6) AS avg_log_ratio
            FROM documents d LEFT JOIN per ON per.id = d.doc_id
        ),
        ranked AS (
            SELECT *,
                   CAST(row_number() OVER (
                       ORDER BY avg_log_ratio DESC NULLS LAST, id) AS INT)
                       AS rank
            FROM full_set
        )
        SELECT id, n_tokens, avg_log_ratio, rank, rank <= 100 AS selected
        FROM ranked ORDER BY id
    """,
    "q_pagerank": f"""
        WITH cs AS (
            SELECT DISTINCT 'c' || o_custkey AS c, 's' || l_suppkey AS s
            FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        ),
        edges AS (
            SELECT c AS src, s AS dst FROM cs
            UNION ALL
            SELECT s, c FROM cs
        ),
        outdeg AS (SELECT src, CAST(count(*) AS BIGINT) AS od FROM edges GROUP BY src),
        nodes AS (
            SELECT src AS node FROM edges UNION SELECT dst FROM edges
        ),
        nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn),{_PR_ITERS}
        SELECT node, round(r5.rank, 6) AS rank
        FROM r5 ORDER BY node
    """,
    "ss_random_project": f"""
        SELECT vec_id,
               CAST(unnest([0, 1, 2, 3, 4, 5, 6, 7]) AS INT) AS j,
               unnest([{_RP_ROWS}]) AS v
        FROM embeddings
        ORDER BY vec_id, j
    """,
    "ml_pca_contract": """
        -- SQL-expressible half of the PCA contract: row count, dim, and
        -- total variance = sum of per-dimension population variances
        -- (= trace of the covariance the Spark fit decomposes). The
        -- eigen-invariant booleans are recomputed INSIDE the Spark query
        -- and must all be true.
        WITH per AS (
            SELECT i, var_pop(CAST(embedding[i] AS DOUBLE)) AS v
            FROM embeddings, unnest(generate_series(1, 64)) AS g(i)
            GROUP BY i
        )
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM embeddings) AS n,
               CAST(64 AS INT) AS dim,
               CAST(2 AS INT) AS k,
               round(sum(v), 6) AS total_variance,
               TRUE AS orthonormal,
               TRUE AS variance_identity,
               TRUE AS eigenvalues_ok
        FROM per
    """,
    "tx_bpe_pairs": """
        -- BPE merge-step statistics recomputed from first principles:
        -- word frequencies over the [^a-z]-split corpus, then adjacent
        -- character pairs weighted by word count. range(1, L) is
        -- end-exclusive -> positions 1..L-1, i.e. substr(word, i, 2).
        WITH words AS (
            SELECT w AS word, count(*) AS n
            FROM documents,
                 unnest(string_split_regex(
                     trim(regexp_replace(lower(text), '[^a-z]+', ' ', 'g')),
                     ' +')) AS t(w)
            WHERE length(w) > 0
            GROUP BY 1
        ), pairs AS (
            SELECT substr(word, CAST(i AS INT), 2) AS pair,
                   CAST(sum(n) AS BIGINT) AS pair_count
            FROM words, unnest(range(1, length(word))) AS r(i)
            WHERE length(word) >= 2
            GROUP BY 1
        ), ranked AS (
            SELECT CAST(row_number() OVER (ORDER BY pair_count DESC, pair ASC) AS INT)
                       AS rank,
                   pair, pair_count
            FROM pairs
        )
        SELECT rank, pair, pair_count FROM ranked WHERE rank <= 50
    """,
    "t13_negative_sample": """
        -- Replays negative_sample's universal-hash arithmetic exactly:
        -- uhash(s, n, a, b) = ((a * (sha256-48-bit-prefix % p) + b) % p) % n,
        -- p = 2^31-1. Pool rows rank inside hash buckets; each (anchor, j)
        -- draw picks (bucket, 1 + pick % bucket_count).
        WITH ranked AS (
            SELECT doc_id AS neg_id,
                   (2654435761 * (CAST('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 12)
                                       AS BIGINT) % 2147483647) + 40503)
                       % 2147483647 % 16 AS bucket,
                   (97 * (CAST('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 12)
                               AS BIGINT) % 2147483647) + 1009)
                       % 2147483647 AS ord
            FROM documents WHERE lang <> 'en'
        ), rn AS (
            SELECT neg_id, bucket,
                   row_number() OVER (PARTITION BY bucket ORDER BY ord, neg_id) AS rnk
            FROM ranked
        ), cnt AS (
            SELECT bucket, c, row_number() OVER (ORDER BY bucket) - 1 AS idx
            FROM (SELECT bucket, count(*) AS c FROM rn GROUP BY 1)
        ), nb AS (SELECT count(*) AS n FROM cnt
        ), draws AS (
            SELECT d.doc_id AS anchor_id, j,
                   (2654435761 * (CAST('0x' || substr(sha256(CAST(d.doc_id AS VARCHAR) || '#' || j), 1, 12)
                                       AS BIGINT) % 2147483647) + 40503)
                       % 2147483647 AS braw,
                   (7919 * (CAST('0x' || substr(sha256(CAST(d.doc_id AS VARCHAR) || '#' || j), 1, 12)
                                AS BIGINT) % 2147483647) + 104729)
                       % 2147483647 AS pick
            FROM documents d, unnest([1, 2, 3]) AS u(j)
            WHERE d.lang = 'en'
        )
        SELECT draws.anchor_id, CAST(draws.j AS INT) AS j, rn.neg_id
        FROM draws
        JOIN nb ON TRUE
        JOIN cnt ON draws.braw % nb.n = cnt.idx
        JOIN rn ON rn.bucket = cnt.bucket AND rn.rnk = draws.pick % cnt.c + 1
        WHERE rn.neg_id <> draws.anchor_id
    """,
    "s19_compaction_plan": """
        -- bin = floor(exclusive prefix sum of bytes / target), files
        -- ordered by name inside each lang partition.
        WITH inv AS (
            SELECT lang, source, CAST(sum(n_chars) AS BIGINT) AS bytes
            FROM documents GROUP BY 1, 2
        )
        SELECT lang, source, bytes,
               CAST(floor(coalesce(sum(bytes) OVER (
                        PARTITION BY lang ORDER BY source
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    ), 0) / 65536.0) AS BIGINT) AS bin
        FROM inv
    """,
    "st_sliding_topk": """
        -- 2h windows sliding by 1h, epoch-aligned: an event at t belongs
        -- to the windows starting at hour_floor(t) and hour_floor(t)-1h.
        WITH c AS (
            SELECT strftime(date_trunc('hour', ts) - o * INTERVAL 1 HOUR,
                            '%Y-%m-%d %H:%M:%S') AS window_start,
                   event_type, count(*) AS n
            FROM events, unnest([0, 1]) AS u(o)
            GROUP BY 1, 2
        ), r AS (
            SELECT window_start, event_type, n,
                   CAST(row_number() OVER (PARTITION BY window_start
                                           ORDER BY n DESC, event_type) AS INT) AS rank
            FROM c
        )
        SELECT window_start, rank, event_type, n FROM r WHERE rank <= 3
    """,
    "q_bloom_prejoin": """
        -- Replays bloom_prejoin's exact bit positions: 3 universal hashes
        -- ((a*x+b) % p) % 16384 with x = sha256 48-bit prefix % p over the
        -- key string; a fact row passes iff ALL its positions are set.
        WITH keys AS (
            SELECT DISTINCT o_orderkey FROM orders WHERE o_totalprice > 400000
        ), pos AS (
            SELECT (131 * (CAST('0x' || substr(sha256(CAST(o_orderkey AS VARCHAR)), 1, 12) AS BIGINT) % 2147483647) + 137) % 2147483647 % 16384 AS p FROM keys
            UNION
            SELECT (977 * (CAST('0x' || substr(sha256(CAST(o_orderkey AS VARCHAR)), 1, 12) AS BIGINT) % 2147483647) + 983) % 2147483647 % 16384 FROM keys
            UNION
            SELECT (7919 * (CAST('0x' || substr(sha256(CAST(o_orderkey AS VARCHAR)), 1, 12) AS BIGINT) % 2147483647) + 7927) % 2147483647 % 16384 FROM keys
        ), passed AS (
            SELECT l_orderkey, l_returnflag
            FROM lineitem
            WHERE (131 * (CAST('0x' || substr(sha256(CAST(l_orderkey AS VARCHAR)), 1, 12) AS BIGINT) % 2147483647) + 137) % 2147483647 % 16384 IN (SELECT p FROM pos)
              AND (977 * (CAST('0x' || substr(sha256(CAST(l_orderkey AS VARCHAR)), 1, 12) AS BIGINT) % 2147483647) + 983) % 2147483647 % 16384 IN (SELECT p FROM pos)
              AND (7919 * (CAST('0x' || substr(sha256(CAST(l_orderkey AS VARCHAR)), 1, 12) AS BIGINT) % 2147483647) + 7927) % 2147483647 % 16384 IN (SELECT p FROM pos)
        )
        SELECT l_returnflag,
               count(*) AS n_pass_bloom,
               CAST(sum(CASE WHEN k.o_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_true_match,
               CAST(sum(CASE WHEN k.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_false_pos
        FROM passed LEFT JOIN keys k ON passed.l_orderkey = k.o_orderkey
        GROUP BY 1
    """,
    "q_triangles": """
        -- Orientation-independent recount: triangles = ordered u<v<w
        -- 3-way self-join; wedges = sum d(d-1)/2 over degrees.
        WITH lp AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ), e AS (
            SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
            FROM lp a JOIN lp b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        ), deg AS (
            SELECT n, count(*) AS d
            FROM (SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e)
            GROUP BY 1
        ), tri AS (
            SELECT count(*) AS t
            FROM e e1 JOIN e e2 ON e2.u = e1.v
                      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
        )
        SELECT (SELECT count(*) FROM deg) AS n_nodes,
               (SELECT count(*) FROM e) AS n_edges,
               (SELECT CAST(sum(d * (d - 1) / 2) AS BIGINT) FROM deg) AS n_wedges,
               (SELECT t FROM tri) AS n_triangles,
               round(3.0 * (SELECT t FROM tri)
                     / nullif((SELECT sum(d * (d - 1) / 2) FROM deg), 0), 6)
                   AS clustering_coeff
    """,
    "e22_loo_target_encode": """
        -- exact integer-cent sums; one double division per row
        WITH c AS (
            SELECT c_custkey, c_mktsegment,
                   CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal_cents
            FROM customer
        ), s AS (
            SELECT c_mktsegment, CAST(sum(bal_cents) AS BIGINT) AS sm,
                   count(bal_cents) AS n
            FROM c GROUP BY 1
        ), g AS (
            SELECT CAST(sum(bal_cents) AS DOUBLE) / count(bal_cents) AS gm FROM c
        )
        SELECT c.c_custkey, c.c_mktsegment,
               round(coalesce(
                   CAST(sm - bal_cents AS DOUBLE) / nullif(CAST(n - 1 AS DOUBLE), 0.0),
                   gm), 6) AS loo_bal
        FROM c JOIN s USING (c_mktsegment) CROSS JOIN g
    """,
    "t14_cluster_safe_split": f"""
        -- recursive near-dup components + split_by_hash's md5 bucket
        -- arithmetic on the cluster id (bucket < 3000 of 10000 = 30%)
        WITH RECURSIVE {_NGRAM_PAIRS}
        SELECT d.doc_id,
               coalesce(c.component, d.doc_id) AS split_group,
               (CAST('0x' || substr(md5(CAST(coalesce(c.component, d.doc_id) AS VARCHAR)), 1, 8)
                     AS BIGINT) % 10000) < 3000 AS is_test
        FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
    """,
    "m23_ridge_path": """
        -- identical Cramer's-rule algebra on the same five sums
        WITH m AS (
            SELECT sum(l_quantity * l_quantity) AS sxx,
                   sum(l_quantity * l_discount) AS sxz,
                   sum(l_discount * l_discount) AS szz,
                   sum(l_quantity * l_extendedprice) AS sxy,
                   sum(l_discount * l_extendedprice) AS szy
            FROM lineitem
        )
        SELECT CAST(lam AS DOUBLE) AS lam,
               round(((szz + lam) * sxy - sxz * szy)
                     / ((sxx + lam) * (szz + lam) - sxz * sxz), 4) AS b1,
               round(((sxx + lam) * szy - sxz * sxy)
                     / ((sxx + lam) * (szz + lam) - sxz * sxz), 4) AS b2
        FROM m, unnest([0.0, 1000000.0, 100000000.0]) AS l(lam)
    """,
    "q_churn_labels": """
        WITH past AS (
            SELECT user_id, count(*) AS n_events,
                   date_diff('day', CAST(max(ts) AS DATE), DATE '2024-01-20')
                       AS days_since_last,
                   date_diff('day', CAST(min(ts) AS DATE), CAST(max(ts) AS DATE))
                       AS active_span_days
            FROM events
            WHERE ts < TIMESTAMP '2024-01-20 00:00:00'
            GROUP BY 1
        ), fut AS (
            SELECT DISTINCT user_id FROM events
            WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'
              AND ts < TIMESTAMP '2024-01-27 00:00:00'
        )
        SELECT p.user_id, p.n_events,
               CAST(p.days_since_last AS INT) AS days_since_last,
               CAST(p.active_span_days AS INT) AS active_span_days,
               f.user_id IS NULL AS churned
        FROM past p LEFT JOIN fut f ON p.user_id = f.user_id
    """,
    "pipe_golden_record": """
        -- attribute-wise survivorship: per attribute, the value on the
        -- max-recency record where that attribute is non-null
        WITH o AS (
            SELECT o_custkey,
                   date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))
                       * 10000000000000 + o_orderkey AS rec_key,
                   o_orderstatus AS last_status,
                   CASE WHEN o_totalprice > 250000 THEN o_orderpriority END
                       AS last_hi_priority,
                   o_totalprice AS last_price
            FROM orders
        )
        SELECT o_custkey,
               first(last_status ORDER BY rec_key DESC)
                   FILTER (WHERE last_status IS NOT NULL) AS last_status,
               first(last_hi_priority ORDER BY rec_key DESC)
                   FILTER (WHERE last_hi_priority IS NOT NULL) AS last_hi_priority,
               first(last_price ORDER BY rec_key DESC)
                   FILTER (WHERE last_price IS NOT NULL) AS last_price
        FROM o GROUP BY 1
    """,
    "m24_conformal": """
        WITH keyed AS (
            SELECT l_quantity AS x, l_extendedprice AS y,
                   CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || ':' ||
                                           CAST(l_linenumber AS VARCHAR) || ':' ||
                                           CAST(l_extendedprice AS VARCHAR)), 1, 8)
                        AS BIGINT) % 10000 AS b
            FROM lineitem
        ), fit AS (
            SELECT count(*) AS n_train,
                   round((count(*) * sum(x*y) - sum(x) * sum(y))
                         / (count(*) * sum(x*x) - sum(x) * sum(x)), 4) AS slope,
                   sum(x) AS sx, sum(y) AS sy
            FROM keyed WHERE b < 5000
        ), fit2 AS (
            SELECT n_train, slope,
                   round((sy - slope * sx) / n_train, 4) AS intercept
            FROM fit
        ), calib AS (
            SELECT round(abs(y - (intercept + slope * x)), 6) AS r
            FROM keyed CROSS JOIN fit2 WHERE b >= 5000 AND b < 8000
        ), nc AS (SELECT count(*) AS n_cal FROM calib),
        q AS (
            SELECT r AS qhat FROM calib, nc
            ORDER BY r
            LIMIT 1 OFFSET (SELECT least(CAST(ceil(0.9 * (n_cal + 1)) AS BIGINT), n_cal) - 1 FROM nc)
        )
        SELECT f.n_train, f.slope, f.intercept,
               (SELECT n_cal FROM nc) AS n_cal,
               (SELECT qhat FROM q) AS qhat,
               count(*) AS n_test,
               round(avg(CASE WHEN round(abs(y - (f.intercept + f.slope * x)), 6)
                                   <= (SELECT qhat FROM q)
                              THEN 1.0 ELSE 0.0 END), 6) AS coverage
        FROM keyed CROSS JOIN fit2 f
        WHERE b >= 8000
        GROUP BY 1, 2, 3
    """,
    "m25_ndcg": """
        -- same BM25 CTEs as q_bm25; NDCG math on the rounded-score rank
        WITH ex AS (
            SELECT doc_id AS id,
                   unnest(list_filter(
                       regexp_split_to_array(lower(text), '[ \\t\\n\\x0B\\f\\r]+'),
                       x -> len(x) > 0)) AS t
            FROM documents
        ),
        doclen AS (SELECT id, count(*) AS dl FROM ex GROUP BY id),
        stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM doclen),
        tf AS (
            SELECT id, t, count(*) AS tf FROM ex
            WHERE t IN ('query', 'join', 'stream') GROUP BY id, t
        ),
        dfreq AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
        scored AS (
            SELECT tf.id,
                   round(sum(ln(1 + (n - df + 0.5) / (df + 0.5))
                       * (tf * (1.2 + 1))
                       / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 6) AS s
            FROM tf
            JOIN dfreq USING (t)
            JOIN doclen USING (id)
            CROSS JOIN stats
            GROUP BY tf.id
        ),
        ranked AS (
            SELECT id, row_number() OVER (ORDER BY s DESC, id ASC) AS rank
            FROM scored ORDER BY s DESC, id ASC LIMIT 10
        ),
        rel AS (
            SELECT id, least(3, count(*)) AS rel FROM ex
            WHERE t IN ('query', 'join', 'stream') GROUP BY id
        ),
        dcg AS (
            SELECT sum(coalesce(rel, 0) / log2(rank + 1)) AS dcg
            FROM ranked LEFT JOIN rel USING (id)
        ),
        ideal AS (
            SELECT sum(rel / log2(rnk + 1)) AS idcg
            FROM (SELECT rel, row_number() OVER (ORDER BY rel DESC, id ASC) AS rnk
                  FROM rel ORDER BY rel DESC, id ASC LIMIT 10)
        )
        SELECT CAST(10 AS INT) AS k,
               round(dcg, 6) AS dcg,
               round(idcg, 6) AS idcg,
               round(dcg / nullif(idcg, 0), 6) AS ndcg
        FROM dcg, ideal
    """,
    "tx_bpe_apply": """
        -- identical literal-pattern merge chain over the distinct vocab
        WITH words AS (
            SELECT doc_id AS id, w AS word
            FROM documents,
                 unnest(string_split_regex(
                     trim(regexp_replace(lower(text), '[^a-z]+', ' ', 'g')),
                     ' +')) AS t(w)
            WHERE length(w) > 0
        ), vocab AS (
            SELECT word,
                   len(string_split_regex(trim(
                       regexp_replace(
                       regexp_replace(
                       regexp_replace(
                       regexp_replace(
                       regexp_replace(
                       regexp_replace(
                           regexp_replace(word, '(.)', ' \\1 ', 'g'),
                           ' t  h ', ' th ', 'g'),
                           ' th  e ', ' the ', 'g'),
                           ' i  n ', ' in ', 'g'),
                           ' a  n ', ' an ', 'g'),
                           ' e  r ', ' er ', 'g'),
                           ' an  d ', ' and ', 'g')
                   ), ' +')) AS n_pieces
            FROM (SELECT DISTINCT word FROM words)
        )
        SELECT d.doc_id AS id,
               CAST(coalesce(sum(v.n_pieces), 0) AS BIGINT) AS n_bpe_tokens
        FROM documents d
        LEFT JOIN words w ON w.id = d.doc_id
        LEFT JOIN vocab v ON v.word = w.word
        GROUP BY 1
    """,
    "m26_classification_report": """
        WITH cm AS (
            SELECT CAST(sum(CASE WHEN y = 1 AND p = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
                   CAST(sum(CASE WHEN y = 0 AND p = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
                   CAST(sum(CASE WHEN y = 1 AND p = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
                   CAST(sum(CASE WHEN y = 0 AND p = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
            FROM (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
                         CASE WHEN contains(text, ' the ') THEN 1 ELSE 0 END AS p
                  FROM documents)
        ), m AS (
            SELECT tp, fp, fn, tn,
                   CAST(tp AS DOUBLE) AS tpd, CAST(fp AS DOUBLE) AS fpd,
                   CAST(fn AS DOUBLE) AS fnd, CAST(tn AS DOUBLE) AS tnd,
                   CAST(tp + fp + fn + tn AS DOUBLE) AS n
            FROM cm
        )
        SELECT tp, fp, fn, tn,
               round(tpd / nullif(tpd + fpd, 0), 6) AS precision,
               round(tpd / nullif(tpd + fnd, 0), 6) AS recall,
               round(2 * (tpd / nullif(tpd + fpd, 0)) * (tpd / nullif(tpd + fnd, 0))
                     / nullif(tpd / nullif(tpd + fpd, 0) + tpd / nullif(tpd + fnd, 0), 0),
                     6) AS f1,
               round((tpd + tnd) / n, 6) AS accuracy,
               round((tpd / nullif(tpd + fnd, 0) + tnd / nullif(tnd + fpd, 0)) / 2, 6)
                   AS balanced_accuracy,
               round((tpd * tnd - fpd * fnd)
                     / nullif(sqrt((tpd + fpd) * (tpd + fnd) * (tnd + fpd) * (tnd + fnd)), 0),
                     6) AS mcc,
               round(((tpd + tnd) / n
                      - ((tpd + fpd) * (tpd + fnd) + (fnd + tnd) * (fpd + tnd)) / (n * n))
                     / nullif(1 - ((tpd + fpd) * (tpd + fnd) + (fnd + tnd) * (fpd + tnd)) / (n * n), 0),
                     6) AS cohens_kappa
        FROM m
    """,
    "s20_content_hash": """
        SELECT 'orders' AS "table", count(*) AS n_rows,
               coalesce(bit_xor(CAST('0x' || substr(md5(
                   CASE WHEN o_orderkey IS NULL THEN 'N|' ELSE 'V' || len(CAST(o_orderkey AS VARCHAR)) || ':' || CAST(o_orderkey AS VARCHAR) || '|' END ||
                   CASE WHEN o_custkey IS NULL THEN 'N|' ELSE 'V' || len(CAST(o_custkey AS VARCHAR)) || ':' || CAST(o_custkey AS VARCHAR) || '|' END ||
                   CASE WHEN o_orderstatus IS NULL THEN 'N|' ELSE 'V' || len(o_orderstatus) || ':' || o_orderstatus || '|' END ||
                   CASE WHEN o_orderpriority IS NULL THEN 'N|' ELSE 'V' || len(o_orderpriority) || ':' || o_orderpriority || '|' END), 1, 15) AS BIGINT)), 0)
                   AS content_hash
        FROM orders
        UNION ALL
        SELECT 'customer', count(*),
               coalesce(bit_xor(CAST('0x' || substr(md5(
                   CASE WHEN c_custkey IS NULL THEN 'N|' ELSE 'V' || len(CAST(c_custkey AS VARCHAR)) || ':' || CAST(c_custkey AS VARCHAR) || '|' END ||
                   CASE WHEN c_nationkey IS NULL THEN 'N|' ELSE 'V' || len(CAST(c_nationkey AS VARCHAR)) || ':' || CAST(c_nationkey AS VARCHAR) || '|' END ||
                   CASE WHEN c_mktsegment IS NULL THEN 'N|' ELSE 'V' || len(c_mktsegment) || ':' || c_mktsegment || '|' END), 1, 15) AS BIGINT)), 0)
        FROM customer
    """,
    "ml_kmeans": _kmeans_oracle_sql(),
    "p35_null_patterns": """
        SELECT (CASE WHEN l_orderkey % 10 = 3 THEN '1' ELSE '0' END ||
                CASE WHEN l_orderkey % 15 = 3 THEN '1' ELSE '0' END ||
                CASE WHEN l_orderkey % 6 = 3 THEN '1' ELSE '0' END) AS pattern,
               count(*) AS n_rows
        FROM lineitem GROUP BY 1 ORDER BY 1
    """,
    "q_skyline": """
        WITH per_d AS (
            SELECT o_orderdate AS d, max(o_totalprice) AS pmax
            FROM orders GROUP BY 1
        ), scan AS (
            SELECT d, pmax,
                   max(pmax) OVER (ORDER BY d
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS prev_best
            FROM per_d
        )
        SELECT strftime(CAST(d AS DATE), '%Y-%m-%d 00:00:00') AS order_date,
               pmax AS best_price
        FROM scan WHERE prev_best IS NULL OR pmax > prev_best
    """,
    "m35_pair_confusion": """
        WITH joint AS (
            SELECT lang AS a, source AS b, count(*) AS nab
            FROM documents GROUP BY 1, 2
        ), s AS (
            SELECT CAST(sum(nab * (nab - 1) / 2) AS DOUBLE) AS tp,
                   CAST(sum(nab) AS BIGINT) AS n
            FROM joint
        ), sa AS (
            SELECT CAST(sum(na * (na - 1) / 2) AS DOUBLE) AS sa
            FROM (SELECT sum(nab) AS na FROM joint GROUP BY a)
        ), sb AS (
            SELECT CAST(sum(nb * (nb - 1) / 2) AS DOUBLE) AS sb
            FROM (SELECT sum(nab) AS nb FROM joint GROUP BY b)
        )
        SELECT n,
               CAST(tp AS BIGINT) AS tp_pairs,
               CAST(sa - tp AS BIGINT) AS fp_pairs,
               CAST(sb - tp AS BIGINT) AS fn_pairs,
               CAST(CAST(n AS DOUBLE) * (n - 1) / 2 - sa - sb + tp AS BIGINT)
                   AS tn_pairs,
               round(tp / nullif(sqrt(sa * sb), 0), 6) AS fowlkes_mallows,
               round((tp + (CAST(n AS DOUBLE) * (n - 1) / 2 - sa - sb + tp))
                     / nullif(CAST(n AS DOUBLE) * (n - 1) / 2, 0), 6) AS rand_index
        FROM s, sa, sb
    """,
    "tx_novelty": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+'),
                               x -> len(x) > 0) AS tk
            FROM documents
        ), grams AS (
            SELECT doc_id, unnest(gs) AS g
            FROM (SELECT doc_id,
                         CASE WHEN len(tk) >= 3 THEN
                             list_distinct(list_transform(range(1, len(tk) - 1),
                                 i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))
                         ELSE [] END AS gs
                  FROM toks)
        ), first_seen AS (
            SELECT g, min(doc_id) AS first_id FROM grams GROUP BY 1
        ), per_doc AS (
            SELECT doc_id, count(*) AS n_grams,
                   CAST(sum(CASE WHEN first_id = doc_id THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_novel
            FROM grams JOIN first_seen USING (g)
            GROUP BY 1
        )
        SELECT d.doc_id AS id,
               coalesce(p.n_grams, 0) AS n_grams,
               coalesce(p.n_novel, 0) AS n_novel,
               round(coalesce(p.n_novel, 0)
                     / nullif(CAST(coalesce(p.n_grams, 0) AS DOUBLE), 0),
                     6) AS novelty
        FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """,
    "m34_best_f1": f"""
        WITH {_AUC_BASE_SQL}, per AS (
            SELECT s, count(*) AS c, CAST(sum(y) AS BIGINT) AS p
            FROM base GROUP BY s
        ), cum AS (
            SELECT s,
                   sum(p) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS tp,
                   sum(c - p) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED
                                    PRECEDING AND CURRENT ROW) AS fp,
                   sum(p) OVER () AS pos
            FROM per
        ), scored AS (
            SELECT s AS threshold,
                   CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
                   CAST(pos - tp AS BIGINT) AS fn,
                   round(2 * CAST(tp AS DOUBLE)
                         / nullif(2 * CAST(tp AS DOUBLE) + fp + (pos - tp), 0),
                         6) AS f1
            FROM cum
        )
        SELECT threshold, tp, fp, fn, f1
        FROM scored ORDER BY f1 DESC, threshold DESC LIMIT 1
    """,
    "m33_best_split": """
        WITH per_v AS (
            SELECT l_quantity AS v, count(*) AS n,
                   CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                        AS BIGINT) AS pos
            FROM lineitem GROUP BY 1
        ), cum AS (
            SELECT v,
                   sum(n) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS nl,
                   sum(pos) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS pl,
                   sum(n) OVER () AS nt,
                   sum(pos) OVER () AS pt
            FROM per_v
        ), scored AS (
            SELECT v AS threshold,
                   CAST(nl AS BIGINT) AS n_left,
                   CAST(nt - nl AS BIGINT) AS n_right,
                   round((CAST(nl AS DOUBLE)
                          * (1 - pow(CAST(pl AS DOUBLE) / nl, 2)
                               - pow(1 - CAST(pl AS DOUBLE) / nl, 2))
                          + CAST(nt - nl AS DOUBLE)
                          * (1 - pow(CAST(pt - pl AS DOUBLE) / (nt - nl), 2)
                               - pow(1 - CAST(pt - pl AS DOUBLE) / (nt - nl), 2)))
                         / CAST(nt AS DOUBLE), 6) AS gini
            FROM cum WHERE nl < nt
        )
        SELECT threshold, n_left, n_right, gini
        FROM scored ORDER BY gini ASC, threshold ASC LIMIT 1
    """,
    "pipe_training_frame": """
        WITH past AS (
            SELECT user_id, count(*) AS n_events,
                   date_diff('day', CAST(max(ts) AS DATE), DATE '2024-01-20')
                       AS days_since_last,
                   date_diff('day', CAST(min(ts) AS DATE), CAST(max(ts) AS DATE))
                       AS active_span_days
            FROM events WHERE ts < TIMESTAMP '2024-01-20 00:00:00'
            GROUP BY 1
        ), fut AS (
            SELECT DISTINCT user_id FROM events
            WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'
              AND ts < TIMESTAMP '2024-01-27 00:00:00'
        ), behav AS (
            SELECT user_id,
                   CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_purchases,
                   round(sum(CASE WHEN event_type = 'purchase' THEN value
                                  ELSE 0.0 END), 6) AS purchase_value
            FROM events WHERE ts < TIMESTAMP '2024-01-20 00:00:00'
            GROUP BY 1
        ), lo AS (
            SELECT o_custkey AS user_id,
                   first(o_totalprice ORDER BY
                         date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))
                             * 10000000000000 + o_orderkey DESC) AS last_order_price
            FROM orders WHERE o_orderdate < DATE '2024-01-20'
            GROUP BY 1
        )
        SELECT p.user_id,
               p.n_events,
               CAST(p.days_since_last AS INT) AS days_since_last,
               CAST(p.active_span_days AS INT) AS active_span_days,
               coalesce(b.n_purchases, 0) AS n_purchases,
               coalesce(b.purchase_value, 0.0) AS purchase_value,
               lo.last_order_price,
               f.user_id IS NULL AS churned
        FROM past p
        LEFT JOIN fut f ON p.user_id = f.user_id
        LEFT JOIN behav b ON p.user_id = b.user_id
        LEFT JOIN lo ON p.user_id = lo.user_id
    """,
    "ml_davies_bouldin": """
        WITH dims AS (
            SELECT vec_id AS id, label AS lbl, i - 1 AS pos,
                   CAST(embedding[i] AS DOUBLE) AS v
            FROM embeddings, unnest(generate_series(1, 64)) AS g(i)
        ), cent AS (
            SELECT lbl AS clbl, pos, avg(v) AS c FROM dims GROUP BY 1, 2
        ), own AS (
            SELECT d.id, d.lbl, sqrt(sum((d.v - c.c) * (d.v - c.c))) AS dist
            FROM dims d JOIN cent c ON c.clbl = d.lbl AND c.pos = d.pos
            GROUP BY 1, 2
        ), scatter AS (
            SELECT lbl, avg(dist) AS s FROM own GROUP BY 1
        ), cdist AS (
            SELECT a.clbl AS la, b.clbl AS lb,
                   sqrt(sum((a.c - b.c) * (a.c - b.c))) AS dij
            FROM cent a JOIN cent b ON a.pos = b.pos AND a.clbl <> b.clbl
            GROUP BY 1, 2
        ), ratios AS (
            SELECT la, max((sa.s + sb.s) / dij) AS rmax
            FROM cdist
            JOIN scatter sa ON sa.lbl = la
            JOIN scatter sb ON sb.lbl = lb
            GROUP BY 1
        )
        SELECT count(*) AS n_clusters, round(avg(rmax), 6) AS db_index
        FROM ratios
    """,
    "m32_ari": """
        WITH joint AS (
            SELECT lang AS a, source AS b, count(*) AS nab
            FROM documents GROUP BY 1, 2
        ), s AS (
            SELECT CAST(sum(nab * (nab - 1) / 2) AS DOUBLE) AS s,
                   CAST(sum(nab) AS BIGINT) AS n
            FROM joint
        ), sa AS (
            SELECT CAST(sum(na * (na - 1) / 2) AS DOUBLE) AS sa
            FROM (SELECT sum(nab) AS na FROM joint GROUP BY a)
        ), sb AS (
            SELECT CAST(sum(nb * (nb - 1) / 2) AS DOUBLE) AS sb
            FROM (SELECT sum(nab) AS nb FROM joint GROUP BY b)
        )
        SELECT n,
               round((s - sa * sb / (CAST(n AS DOUBLE) * (n - 1) / 2))
                     / nullif((sa + sb) / 2
                              - sa * sb / (CAST(n AS DOUBLE) * (n - 1) / 2), 0),
                     6) AS ari
        FROM s, sa, sb
    """,
    "m31_nmi": """
        WITH joint AS (
            SELECT lang AS a, source AS b, count(*) AS nab
            FROM documents GROUP BY 1, 2
        ), n AS (SELECT CAST(sum(nab) AS DOUBLE) AS n FROM joint
        ), na AS (SELECT a, CAST(sum(nab) AS DOUBLE) AS na FROM joint GROUP BY 1
        ), nb AS (SELECT b, CAST(sum(nab) AS DOUBLE) AS nb FROM joint GROUP BY 1
        ), mi AS (
            SELECT sum((nab / n.n) * ln((nab / n.n) / ((na / n.n) * (nb / n.n)))) AS mi
            FROM joint JOIN na USING (a) JOIN nb USING (b) CROSS JOIN n
        ), ha AS (SELECT sum(-(na / n.n) * ln(na / n.n)) AS h_a FROM na, n
        ), hb AS (SELECT sum(-(nb / n.n) * ln(nb / n.n)) AS h_b FROM nb, n)
        SELECT CAST((SELECT n FROM n) AS BIGINT) AS n,
               round(h_a, 6) AS h_a, round(h_b, 6) AS h_b,
               round(mi, 6) AS mi,
               round(mi / nullif(sqrt(h_a * h_b), 0), 6) AS nmi
        FROM mi, ha, hb
    """,
    "ml_silhouette": """
        WITH dims AS (
            SELECT vec_id AS id, label AS lbl, i - 1 AS pos,
                   CAST(embedding[i] AS DOUBLE) AS v
            FROM embeddings, unnest(generate_series(1, 64)) AS g(i)
        ), cent AS (
            SELECT lbl AS clbl, pos, avg(v) AS c FROM dims GROUP BY 1, 2
        ), d2 AS (
            SELECT id, lbl, clbl, sqrt(sum((v - c) * (v - c))) AS dist
            FROM dims JOIN cent USING (pos)
            GROUP BY 1, 2, 3
        ), per_point AS (
            SELECT id, lbl,
                   min(CASE WHEN clbl = lbl THEN dist END) AS a,
                   min(CASE WHEN clbl <> lbl THEN dist END) AS b
            FROM d2 GROUP BY 1, 2
        )
        SELECT lbl AS label, count(*) AS n,
               round(avg((b - a) / greatest(a, b)), 6) AS mean_silhouette
        FROM per_point GROUP BY 1 ORDER BY 1
    """,
    "m30_kaplan_meier": """
        WITH spans AS (
            SELECT user_id, min(ts) AS fts, max(ts) AS lts
            FROM events GROUP BY 1
        ), ferr AS (
            SELECT user_id, min(ts) AS ets FROM events
            WHERE event_type = 'error' GROUP BY 1
        ), subjects AS (
            SELECT CAST(floor((epoch_us(coalesce(ets, lts)) - epoch_us(fts))
                              / 3600000000.0) AS BIGINT) AS duration,
                   CASE WHEN ets IS NOT NULL THEN 1 ELSE 0 END AS event
            FROM spans LEFT JOIN ferr USING (user_id)
        ), per_t AS (
            SELECT duration AS t, CAST(sum(event) AS BIGINT) AS d,
                   count(*) AS leaving
            FROM subjects GROUP BY 1
        ), at_risk AS (
            SELECT t, d, (SELECT count(*) FROM subjects)
                   - coalesce(sum(leaving) OVER (ORDER BY t
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS n_risk
            FROM per_t
        ), steps AS (SELECT * FROM at_risk WHERE d > 0)
        SELECT t, CAST(n_risk AS BIGINT) AS n_risk,
               d AS d_events,
               round(CASE WHEN max(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
                              OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) = 1
                          THEN 0.0
                          ELSE exp(sum(ln(nullif(1 - d / CAST(n_risk AS DOUBLE), 0)))
                               OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW))
                     END, 6) AS survival
        FROM steps
    """,
    "q_max_concurrency": """
        WITH iv AS (
            SELECT user_id, CAST(ts AS DATE) AS d,
                   min(ts) AS s, max(ts) + INTERVAL 1 MINUTE AS e
            FROM events GROUP BY 1, 2
        ), ev AS (
            SELECT s AS at, 1 AS delta FROM iv
            UNION ALL
            SELECT e, -1 FROM iv
        )
        SELECT CAST(max(c) AS BIGINT) AS max_concurrent
        FROM (SELECT sum(delta) OVER (ORDER BY at, delta
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
              FROM ev)
    """,
    "p34_ref_integrity": """
        SELECT 'lineitem->orders' AS edge,
               (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
                   (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans
        UNION ALL
        SELECT 'lineitem->part',
               (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
                   (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
        UNION ALL
        SELECT 'lineitem->supplier',
               (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
                   (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
        UNION ALL
        SELECT 'orders->customer',
               (SELECT count(*) FROM orders o WHERE NOT EXISTS
                   (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        UNION ALL
        SELECT 'customer->nation',
               (SELECT count(*) FROM customer c WHERE NOT EXISTS
                   (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
        UNION ALL
        SELECT 'nation->region',
               (SELECT count(*) FROM nation n WHERE NOT EXISTS
                   (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey))
    """,
    "q_revenue_bridge": """
        WITH base AS (
            SELECT l_returnflag, year(l_shipdate) AS y,
                   sum(l_quantity) AS q,
                   sum(l_extendedprice * (1 - l_discount)) AS rev
            FROM lineitem WHERE year(l_shipdate) IN (1997, 1998)
            GROUP BY 1, 2
        ), w AS (
            SELECT l_returnflag,
                   max(CASE WHEN y = 1997 THEN q END) AS q0,
                   max(CASE WHEN y = 1997 THEN rev END) AS rev0,
                   max(CASE WHEN y = 1998 THEN q END) AS q1,
                   max(CASE WHEN y = 1998 THEN rev END) AS rev1
            FROM base GROUP BY 1
        )
        SELECT l_returnflag,
               round(rev1 - rev0, 2) AS rev_delta,
               round((q1 - q0) * (rev0 / q0), 2) AS volume_effect,
               round((rev1 / q1 - rev0 / q0) * q1, 2) AS price_effect
        FROM w WHERE q0 IS NOT NULL AND q1 IS NOT NULL
    """,
    "q_active_users": """
        WITH days AS (
            SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d FROM events
        ), last_day AS (SELECT max(d) AS ld FROM days
        ), contrib AS (
            SELECT u, d + CAST(off AS INT) AS rd, off
            FROM days, unnest(range(0, 28)) AS o(off), last_day
            WHERE d + CAST(off AS INT) <= ld
        )
        SELECT strftime(rd, '%Y-%m-%d') AS day,
               count(DISTINCT CASE WHEN off < 1 THEN u END) AS active_1d,
               count(DISTINCT CASE WHEN off < 7 THEN u END) AS active_7d,
               count(DISTINCT CASE WHEN off < 28 THEN u END) AS active_28d
        FROM contrib GROUP BY 1 ORDER BY 1
    """,
    "s22_range_boundaries": """
        SELECT round(quantile_cont(o_totalprice, 0.125), 6) AS b1,
               round(quantile_cont(o_totalprice, 0.25), 6) AS b2,
               round(quantile_cont(o_totalprice, 0.375), 6) AS b3,
               round(quantile_cont(o_totalprice, 0.5), 6) AS b4,
               round(quantile_cont(o_totalprice, 0.625), 6) AS b5,
               round(quantile_cont(o_totalprice, 0.75), 6) AS b6,
               round(quantile_cont(o_totalprice, 0.875), 6) AS b7
        FROM orders
    """,
    "p33_weighted_median": """
        WITH per_val AS (
            SELECT l_returnflag, l_extendedprice,
                   CAST(sum(l_quantity) AS DOUBLE) AS w
            FROM lineitem GROUP BY 1, 2
        ), cum AS (
            SELECT l_returnflag, l_extendedprice,
                   sum(w) OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
                   sum(w) OVER (PARTITION BY l_returnflag) AS tw
            FROM per_val
        )
        SELECT l_returnflag,
               min(CASE WHEN cw >= 0.25 * tw THEN l_extendedprice END) AS wp25,
               min(CASE WHEN cw >= 0.5 * tw THEN l_extendedprice END) AS wp50,
               min(CASE WHEN cw >= 0.75 * tw THEN l_extendedprice END) AS wp75
        FROM cum GROUP BY 1
    """,
    "dd_prefix_jaccard": """
        -- brute-force reference: full inverted index, exact Jaccard
        WITH items AS (
            SELECT DISTINCT l_orderkey AS id, l_partkey AS it FROM lineitem
            WHERE l_partkey IS NOT NULL
        ), sizes AS (
            SELECT id, count(*) AS n FROM items GROUP BY 1
        ), pairs AS (
            SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
            FROM items a JOIN items b USING (it)
            WHERE a.id < b.id
            GROUP BY 1, 2
        )
        SELECT id_a, id_b, CAST(inter AS INT) AS inter,
               round(inter * 1.0 / (sa.n + sb.n - inter), 6) AS jaccard
        FROM pairs
        JOIN sizes sa ON sa.id = id_a
        JOIN sizes sb ON sb.id = id_b
        WHERE round(inter * 1.0 / (sa.n + sb.n - inter), 6) >= 0.5
    """,
    "t16_quota_allocation": """
        WITH w AS (
            SELECT concat_ws('/', lang, source) AS cell,
                   CAST(sum(n_chars) AS BIGINT) AS mass
            FROM documents GROUP BY 1
        ), tot AS (SELECT CAST(sum(mass) AS BIGINT) AS tw FROM w
        ), shares AS (
            SELECT cell, mass,
                   CAST(floor(q) AS BIGINT) AS base, q - floor(q) AS rem
            FROM (SELECT cell, mass, (mass / tw) * 10000 AS q FROM w, tot)
        ), deficit AS (
            SELECT 10000 - CAST(sum(base) AS BIGINT) AS d FROM shares
        ), ranked AS (
            SELECT cell, mass, base, rem,
                   row_number() OVER (ORDER BY rem DESC, mass DESC, cell ASC) AS rk
            FROM shares
        )
        SELECT cell, round(CAST(mass AS DOUBLE), 6) AS weight,
               base + CASE WHEN rk <= (SELECT d FROM deficit) THEN 1 ELSE 0 END
                   AS quota
        FROM ranked
    """,
    "q_time_to_convert": """
        WITH fv AS (
            SELECT user_id, min(ts) AS vts FROM events
            WHERE event_type = 'view' GROUP BY 1
        ), fp AS (
            SELECT e.user_id, min(e.ts) AS pts, min(fv.vts) AS vts
            FROM events e JOIN fv ON e.user_id = fv.user_id
            WHERE e.event_type = 'purchase' AND e.ts > fv.vts
            GROUP BY 1
        ), lat AS (
            SELECT (epoch_us(pts) - epoch_us(vts)) / 60000000.0 AS mins FROM fp
        )
        SELECT count(*) AS n_converters,
               round(quantile_cont(mins, 0.25), 6) AS p25_mins,
               round(quantile_cont(mins, 0.5), 6) AS p50_mins,
               round(quantile_cont(mins, 0.9), 6) AS p90_mins
        FROM lat
    """,
    "q_hierarchy_flatten": """
        WITH RECURSIVE nodes AS (
            SELECT s_suppkey AS id,
                   CASE WHEN s_suppkey = 0 THEN NULL
                        ELSE (s_suppkey - 1) // 2 END AS parent
            FROM supplier
        ), rec AS (
            -- roots: NULL parent, or a DANGLING parent (no row of its own)
            -- — the latter root at the dangling id with depth 1, matching
            -- flatten_hierarchy's orphan semantics
            SELECT id, CAST(id AS BIGINT) AS root, CAST(0 AS BIGINT) AS depth
            FROM nodes WHERE parent IS NULL
            UNION ALL
            SELECT n.id, CAST(n.parent AS BIGINT), CAST(1 AS BIGINT)
            FROM nodes n
            WHERE n.parent IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM nodes p WHERE p.id = n.parent)
            UNION ALL
            SELECT n.id, r.root, r.depth + 1
            FROM nodes n JOIN rec r ON n.parent = r.id
        )
        SELECT id, root, depth FROM rec
    """,
    "tx_pmi_collocations": """
        WITH toks AS (
            SELECT list_filter(regexp_split_to_array(lower(text), '[ \\t\\n\\x0B\\f\\r]+'),
                               x -> len(x) > 0) AS tk
            FROM documents
        ), uni AS (
            SELECT w, count(*) AS cw
            FROM toks, unnest(tk) AS t(w) GROUP BY 1
        ), tot AS (SELECT CAST(sum(cw) AS BIGINT) AS n FROM uni
        ), bi AS (
            SELECT tk[CAST(i AS INT)] AS w1, tk[CAST(i AS INT) + 1] AS w2,
                   count(*) AS cxy
            FROM toks, unnest(range(1, len(tk))) AS r(i)
            WHERE len(tk) > 1
            GROUP BY 1, 2
            HAVING count(*) >= 5
        ), scored AS (
            SELECT w1 || ' ' || w2 AS bigram, cxy,
                   round(ln(n * cxy * 1.0 / (u1.cw * u2.cw)), 6) AS pmi
            FROM bi
            JOIN uni u1 ON u1.w = bi.w1
            JOIN uni u2 ON u2.w = bi.w2
            CROSS JOIN tot
        )
        SELECT CAST(row_number() OVER (ORDER BY cxy DESC, bigram ASC) AS INT) AS rank,
               bigram, cxy, pmi
        FROM scored ORDER BY cxy DESC, bigram ASC LIMIT 20
    """,
    "tx_vocab_coverage": """
        WITH wc AS (
            SELECT w, count(*) AS n
            FROM documents,
                 unnest(list_filter(regexp_split_to_array(lower(text), '[ \\t\\n\\x0B\\f\\r]+'),
                                    x -> len(x) > 0)) AS t(w)
            GROUP BY 1
        ), ranked AS (
            SELECT n,
                   row_number() OVER (ORDER BY n DESC, w ASC) AS rank,
                   sum(n) OVER (ORDER BY n DESC, w ASC
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum
            FROM wc
        ), tot AS (
            SELECT CAST(sum(n) AS BIGINT) AS total, count(*) AS n_types FROM wc
        )
        SELECT CAST(rank AS BIGINT) AS vocab_size,
               round(cum * 1.0 / total, 6) AS coverage,
               n_types
        FROM ranked, tot
        WHERE rank IN (5, 10, 25)
        ORDER BY rank
    """,
    "s21_bin_manifest": """
        WITH inv AS (
            SELECT lang, source, CAST(sum(n_chars) AS BIGINT) AS bytes
            FROM documents GROUP BY 1, 2
        ), plan AS (
            SELECT lang, source, bytes,
                   CAST(floor(coalesce(sum(bytes) OVER (
                            PARTITION BY lang ORDER BY source
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                        ), 0) / 65536.0) AS BIGINT) AS bin
            FROM inv
        )
        SELECT lang, bin, count(*) AS n_files,
               CAST(sum(bytes) AS BIGINT) AS total_bytes,
               min(source) AS min_key, max(source) AS max_key
        FROM plan GROUP BY 1, 2
    """,
    "m29_time_series_cv": """
        WITH base AS (
            SELECT CAST(l_shipdate AS DATE) AS d,
                   CAST(l_quantity AS DOUBLE) AS x,
                   l_extendedprice AS y
            FROM lineitem
        ), e AS (
            SELECT origin, CAST(origin AS DATE) AS od, d, x, y
            FROM base, unnest(['1997-01-01', '1998-01-01', '1999-01-01']) AS f(origin)
        ), agg AS (
            SELECT origin,
                   CAST(count(*) FILTER (WHERE d < od) AS BIGINT) AS n_train,
                   CAST(count(*) FILTER (WHERE d >= od AND d < od + INTERVAL 90 DAY)
                        AS BIGINT) AS n_valid,
                   sum(x) FILTER (WHERE d < od) AS sx,
                   sum(y) FILTER (WHERE d < od) AS sy,
                   sum(x * x) FILTER (WHERE d < od) AS sxx,
                   sum(x * y) FILTER (WHERE d < od) AS sxy
            FROM e GROUP BY 1
        ), fit AS (
            SELECT origin, n_train, n_valid,
                   round((n_train * sxy - sx * sy)
                         / (n_train * sxx - sx * sx), 4) AS slope,
                   sx, sy
            FROM agg
        ), fit2 AS (
            SELECT origin, n_train, n_valid, slope,
                   round((sy - slope * sx) / n_train, 4) AS intercept
            FROM fit
        )
        , mae AS (
            SELECT origin,
                   round(avg(abs(e.y - (f.intercept + f.slope * e.x))), 6) AS valid_mae
            FROM e JOIN fit2 f USING (origin)
            WHERE e.d >= e.od AND e.d < e.od + INTERVAL 90 DAY
            GROUP BY 1
        )
        SELECT f.origin, f.n_train, f.n_valid, f.slope, f.intercept, m.valid_mae
        FROM fit2 f LEFT JOIN mae m USING (origin)
    """,
    "q_event_patterns": """
        WITH j AS (
            SELECT user_id, count(*) AS n_events,
                   string_agg(substr(event_type, 1, 1), ''
                              ORDER BY ts, event_id) AS journey
            FROM events WHERE ts IS NOT NULL GROUP BY 1
        )
        SELECT user_id, n_events, journey,
               CAST(len(regexp_extract_all(journey, 'vcp')) AS INT)
                   AS n_vcp_adjacent,
               CAST(len(regexp_extract_all(journey, 'v[^p]*c[^p]*p')) AS INT)
                   AS n_funnel_gated
        FROM j
    """,
    "q_join_cardinality": """
        WITH ca AS (SELECT o_orderkey AS k, count(*) AS na FROM orders GROUP BY 1),
             cb AS (SELECT l_orderkey AS k, count(*) AS nb FROM lineitem GROUP BY 1),
             per AS (SELECT ca.k, na * nb AS rows FROM ca JOIN cb USING (k)),
             act AS (SELECT count(*) AS actual_rows
                     FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey)
        SELECT CAST(sum(rows) AS BIGINT) AS predicted_rows,
               (SELECT actual_rows FROM act) AS actual_rows,
               CAST(sum(rows) AS BIGINT) = (SELECT actual_rows FROM act)
                   AS estimate_exact,
               CAST(max(rows) AS BIGINT) AS max_key_rows,
               count(*) AS n_matching_keys
        FROM per
    """,
    "p29_l_diversity": """
        WITH banded AS (
            SELECT c_nationkey, c_mktsegment,
                   CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_band
            FROM customer
        ), per_val AS (
            SELECT c_nationkey, c_mktsegment, bal_band, count(*) AS nv
            FROM banded WHERE bal_band IS NOT NULL GROUP BY 1, 2, 3
        ), per_class AS (
            SELECT c_nationkey, c_mktsegment,
                   count(*) AS ndistinct, CAST(sum(nv) AS BIGINT) AS n
            FROM per_val GROUP BY 1, 2
        )
        SELECT count(*) AS n_classes,
               min(ndistinct) AS diversity_l,
               CAST(sum(CASE WHEN ndistinct < 3 THEN 1 ELSE 0 END) AS BIGINT)
                   AS classes_below_l,
               CAST(sum(CASE WHEN ndistinct < 3 THEN n ELSE 0 END) AS BIGINT)
                   AS rows_below_l,
               CAST(sum(n) AS BIGINT) AS n_rows
        FROM per_class
    """,
    "p30_dp_counts": """
        WITH counts AS (
            SELECT c_mktsegment, count(*) AS true_count FROM customer GROUP BY 1
        ), drawn AS (
            SELECT c_mktsegment, true_count,
                   (CAST('0x' || substr(md5(c_mktsegment || '#release-1'), 1, 12)
                         AS BIGINT) + 0.5) / power(16, 12) AS u
            FROM counts
        )
        SELECT c_mktsegment, true_count,
               round(-1.0 * sign(u - 0.5) * ln(1 - 2 * abs(u - 0.5)), 6) AS noise,
               round(true_count + (-1.0 * sign(u - 0.5) * ln(1 - 2 * abs(u - 0.5))), 6)
                   AS released_count
        FROM drawn
    """,
    "q_attribution_models": """
        WITH conv AS (
            SELECT user_id AS u, event_id AS conv, ts AS cts
            FROM events WHERE event_type = 'purchase'
        ), touch AS (
            SELECT user_id AS u, event_id AS tid, event_type AS channel, ts AS tts
            FROM events WHERE event_type IN ('click', 'view')
        ), j AS (
            SELECT u, conv, channel, tts, tid
            FROM conv JOIN touch USING (u)
            WHERE tts < cts AND tts >= cts - INTERVAL 3 DAY
        ), ranked AS (
            SELECT channel,
                   row_number() OVER (PARTITION BY u, conv ORDER BY tts ASC, tid ASC) AS fr,
                   row_number() OVER (PARTITION BY u, conv ORDER BY tts DESC, tid DESC) AS lr,
                   count(*) OVER (PARTITION BY u, conv) AS n
            FROM j
        )
        SELECT channel, count(*) AS n_touches,
               round(CAST(sum(CASE WHEN fr = 1 THEN 1.0 ELSE 0.0 END) AS DOUBLE), 6)
                   AS first_touch,
               round(CAST(sum(CASE WHEN lr = 1 THEN 1.0 ELSE 0.0 END) AS DOUBLE), 6)
                   AS last_touch,
               round(sum(1.0 / n), 6) AS linear
        FROM ranked GROUP BY 1
    """,
    "tx_zipf_slope": """
        WITH wc AS (
            SELECT w, count(*) AS n
            FROM documents,
                 unnest(list_filter(regexp_split_to_array(lower(text), '[ \\t\\n\\x0B\\f\\r]+'),
                                    x -> len(x) > 0)) AS t(w)
            GROUP BY 1
        ), ranked AS (
            SELECT ln(row_number() OVER (ORDER BY n DESC, w ASC)) AS x, ln(n) AS y
            FROM wc ORDER BY n DESC, w ASC LIMIT 1000
        )
        SELECT count(*) AS n_points,
               round((count(*) * sum(x*y) - sum(x) * sum(y))
                     / (count(*) * sum(x*x) - sum(x) * sum(x)), 6) AS zipf_slope
        FROM ranked
    """,
    "tx_diversity": """
        WITH toks AS (
            SELECT lang AS g, w
            FROM documents,
                 unnest(list_filter(regexp_split_to_array(lower(text), '[ \\t\\n\\x0B\\f\\r]+'),
                                    x -> len(x) > 0)) AS t(w)
        ), vocab AS (
            SELECT g, w, count(*) AS n FROM toks GROUP BY 1, 2
        ), tot AS (
            SELECT g, CAST(sum(n) AS BIGINT) AS n_tokens,
                   count(*) AS n_types
            FROM vocab GROUP BY 1
        ), ent AS (
            SELECT v.g,
                   sum(-(n * 1.0 / n_tokens) * ln(n * 1.0 / n_tokens)) AS entropy
            FROM vocab v JOIN tot USING (g) GROUP BY v.g
        )
        SELECT t.g AS lang, t.n_tokens, t.n_types,
               round(t.n_types * 1.0 / t.n_tokens, 6) AS ttr,
               round(e.entropy, 6) AS unigram_entropy
        FROM tot t JOIN ent e ON t.g = e.g
    """,
    "q_rolling_corr": """
        WITH base AS (
            SELECT l_returnflag AS g,
                   date_diff('day', DATE '1990-01-01', CAST(l_shipdate AS DATE)) AS d,
                   CAST(l_quantity AS BIGINT) AS x,
                   CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS y
            FROM lineitem
        ), framed AS (
            SELECT g, d,
                   CAST(count(*) OVER w AS DOUBLE) AS n,
                   CAST(sum(x) OVER w AS DOUBLE) AS sx,
                   CAST(sum(y) OVER w AS DOUBLE) AS sy,
                   CAST(sum(x*x) OVER w AS DOUBLE) AS sxx,
                   CAST(sum(y*y) OVER w AS DOUBLE) AS syy,
                   CAST(sum(x*y) OVER w AS DOUBLE) AS sxy
            FROM base
            WINDOW w AS (PARTITION BY g ORDER BY d
                         RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
        )
        SELECT DISTINCT g, d, CAST(n AS BIGINT) AS n,
               round((n * sxy - sx * sy)
                     / nullif(sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy), 0),
                     6) AS corr
        FROM framed WHERE n >= 10
    """,
    "m27_sliced_report": """
        WITH cm AS (
            SELECT source,
                   CAST(sum(CASE WHEN y = 1 AND p = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
                   CAST(sum(CASE WHEN y = 0 AND p = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
                   CAST(sum(CASE WHEN y = 1 AND p = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
                   CAST(sum(CASE WHEN y = 0 AND p = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
            FROM (SELECT source,
                         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
                         CASE WHEN contains(text, ' the ') THEN 1 ELSE 0 END AS p
                  FROM documents)
            GROUP BY 1
        ), m AS (
            SELECT source, tp, fp, fn, tn,
                   CAST(tp AS DOUBLE) AS tpd, CAST(fp AS DOUBLE) AS fpd,
                   CAST(fn AS DOUBLE) AS fnd, CAST(tn AS DOUBLE) AS tnd,
                   CAST(tp + fp + fn + tn AS DOUBLE) AS n
            FROM cm
        )
        SELECT source, tp, fp, fn, tn,
               round(tpd / nullif(tpd + fpd, 0), 6) AS precision,
               round(tpd / nullif(tpd + fnd, 0), 6) AS recall,
               round(2 * (tpd / nullif(tpd + fpd, 0)) * (tpd / nullif(tpd + fnd, 0))
                     / nullif(tpd / nullif(tpd + fpd, 0) + tpd / nullif(tpd + fnd, 0), 0),
                     6) AS f1,
               round((tpd + tnd) / n, 6) AS accuracy,
               round((tpd / nullif(tpd + fnd, 0) + tnd / nullif(tnd + fpd, 0)) / 2, 6)
                   AS balanced_accuracy,
               round((tpd * tnd - fpd * fnd)
                     / nullif(sqrt((tpd + fpd) * (tpd + fnd) * (tnd + fpd) * (tnd + fnd)), 0),
                     6) AS mcc,
               round(((tpd + tnd) / n
                      - ((tpd + fpd) * (tpd + fnd) + (fnd + tnd) * (fpd + tnd)) / (n * n))
                     / nullif(1 - ((tpd + fpd) * (tpd + fnd) + (fnd + tnd) * (fpd + tnd)) / (n * n), 0),
                     6) AS cohens_kappa
        FROM m
    """,
    # ---- round-4 additions
    "q_cusum_changepoint": """
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS d, count(*) AS x
            FROM events GROUP BY 1
        ), stats AS (SELECT avg(x) AS m, count(*) AS n FROM daily),
        c AS (
            SELECT d,
                   sum(x - m) OVER (ORDER BY d
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s,
                   n
            FROM daily CROSS JOIN stats
        )
        SELECT CAST(d AS VARCHAR) AS change_day,
               round(abs(s), 6) AS cusum_abs,
               CAST(n AS BIGINT) AS n_points
        FROM c ORDER BY abs(s) DESC, d ASC LIMIT 1
    """,
    "m36_trend": """
        WITH m AS (
            SELECT extract('year' FROM o_orderdate) * 12
                   + extract('month' FROM o_orderdate) AS t,
                   count(*) AS x
            FROM orders GROUP BY 1
        ), p AS (
            SELECT sign(b.x - a.x) AS sgn,
                   CAST(b.x - a.x AS DOUBLE) / CAST(b.t - a.t AS DOUBLE) AS slope
            FROM m a JOIN m b ON b.t > a.t
        ), sstat AS (
            SELECT CAST(sum(sgn) AS BIGINT) AS s_stat,
                   count(*) AS np
            FROM p
        ), ties AS (
            SELECT CAST(coalesce(sum(c * (c - 1) * (2 * c + 5)), 0) AS BIGINT)
                   AS tie_term
            FROM (SELECT count(*) AS c FROM m GROUP BY x)
        ), nrow AS (SELECT count(*) AS n_points FROM m),
        ranked AS (
            SELECT slope, row_number() OVER (ORDER BY slope) AS rn FROM p
        ), med AS (
            SELECT avg(slope) AS sen_slope
            FROM ranked CROSS JOIN sstat
            WHERE rn = CAST(floor((np + 1) / 2.0) AS BIGINT)
               OR rn = CAST(floor(np / 2.0) AS BIGINT) + 1
        )
        SELECT CAST(n_points AS BIGINT) AS n_points,
               s_stat,
               round(CAST(n_points * (n_points - 1) * (2 * n_points + 5)
                          - tie_term AS DOUBLE) / 18.0, 6) AS var_s,
               round(CAST(CASE
                   WHEN s_stat > 0 THEN (s_stat - 1)
                       / nullif(sqrt(CAST(n_points * (n_points - 1) * (2 * n_points + 5)
                                      - tie_term AS DOUBLE) / 18.0), 0)
                   WHEN s_stat < 0 THEN (s_stat + 1)
                       / nullif(sqrt(CAST(n_points * (n_points - 1) * (2 * n_points + 5)
                                      - tie_term AS DOUBLE) / 18.0), 0)
                   ELSE 0.0 END AS DOUBLE), 6) AS z_score,
               round(CAST(sen_slope AS DOUBLE), 6) AS sen_slope
        FROM nrow CROSS JOIN sstat CROSS JOIN ties CROSS JOIN med
    """,
    "e24_quantile_transform": """
        WITH counts AS (
            SELECT l_quantity AS v, count(*) AS c
            FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1
        ), tot AS (SELECT sum(c) AS n FROM counts),
        cdf AS (
            SELECT v, c,
                   sum(c) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM counts
        )
        SELECT v AS l_quantity,
               round(CASE WHEN n > 1
                          THEN CAST(cum - c AS DOUBLE) / CAST(n - 1 AS DOUBLE)
                          ELSE 0.0 END, 6)
                   AS q_uniform,
               CAST(c AS BIGINT) AS n_rows
        FROM cdf CROSS JOIN tot
        ORDER BY v
    """,
    "dd_containment": r"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '[ \t\n\x0B\f\r]+'), x -> len(x) > 0) AS tk
            FROM documents
        ),
        grams AS (
            SELECT doc_id,
                   CASE WHEN len(tk) >= 3 THEN
                       list_distinct(list_transform(range(1, len(tk) - 1),
                           i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))
                   ELSE [] END AS gs
            FROM toks
        ),
        base AS (SELECT doc_id, gs FROM grams WHERE len(gs) > 0),
        sizes AS (SELECT doc_id, len(gs) AS ng FROM base),
        ex AS (SELECT doc_id, unnest(gs) AS gram FROM base),
        pairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
            FROM ex a JOIN ex b USING (gram)
            WHERE a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        directed AS (
            SELECT id_a AS id_src, id_b AS id_dst,
                   round(CAST(inter AS DOUBLE) / sa.ng, 6) AS containment
            FROM pairs JOIN sizes sa ON sa.doc_id = id_a
            UNION ALL
            SELECT id_b, id_a, round(CAST(inter AS DOUBLE) / sb.ng, 6)
            FROM pairs JOIN sizes sb ON sb.doc_id = id_b
        )
        SELECT id_src, id_dst, containment FROM directed
        WHERE containment >= 0.4 ORDER BY id_src, id_dst
    """,
    "m37_krippendorff": """
        WITH ratings AS (
            SELECT c_custkey // 3 AS u, c_custkey % 3 AS r,
                   c_mktsegment AS v
            FROM customer
        ), mu AS (
            SELECT u, count(*) AS m FROM ratings GROUP BY 1
        ), valid AS (
            SELECT ratings.*, m FROM ratings JOIN mu USING (u) WHERE m >= 2
        ), totals AS (
            SELECT CAST(count(*) AS BIGINT) AS n_ratings,
                   CAST(count(DISTINCT u) AS BIGINT) AS n_units
            FROM valid
        ), do_num AS (
            SELECT coalesce(sum(CASE WHEN a.v <> b.v
                                     THEN CAST(1 AS DOUBLE) / (a.m - 1)
                                     ELSE 0.0 END), 0.0) AS dn
            FROM valid a JOIN valid b ON a.u = b.u AND a.r <> b.r
        ), masses AS (
            SELECT CAST(sum(nc * nc) AS BIGINT) AS sum_nc2
            FROM (SELECT count(*) AS nc FROM valid GROUP BY v)
        )
        SELECT n_units, n_ratings,
               round(dn / n_ratings, 6) AS d_o,
               round(CAST(n_ratings * n_ratings - sum_nc2 AS DOUBLE)
                     / CAST(n_ratings * (n_ratings - 1) AS DOUBLE), 6) AS d_e,
               round(1.0 - (dn / n_ratings)
                     / nullif(CAST(n_ratings * n_ratings - sum_nc2 AS DOUBLE)
                              / CAST(n_ratings * (n_ratings - 1) AS DOUBLE), 0),
                     6) AS alpha
        FROM totals CROSS JOIN do_num CROSS JOIN masses
    """,
    "m38_bootstrap_ci": f"""
        WITH reps AS (
            SELECT event_id, value, b
            FROM events CROSS JOIN (SELECT unnest(range(1, 101)) AS b)
        ), keyed AS (
            SELECT b, value,
                   (CAST('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':'
                                        || CAST(b AS VARCHAR) || ':7'), 1, 15)
                         AS BIGINT) + 0.5) / 1152921504606846976.0 AS u
            FROM reps
        ), weighted AS (
            SELECT b, value,
                   CASE WHEN u < {_P1CDF[0]!r} THEN 0
                        WHEN u < {_P1CDF[1]!r} THEN 1
                        WHEN u < {_P1CDF[2]!r} THEN 2
                        WHEN u < {_P1CDF[3]!r} THEN 3
                        WHEN u < {_P1CDF[4]!r} THEN 4
                        ELSE 5 END AS k
            FROM keyed
        ), rep_means AS (
            SELECT b, sum(k * value) / nullif(CAST(sum(k) AS DOUBLE), 0) AS m
            FROM weighted GROUP BY b
        ), ranked AS (
            SELECT m, row_number() OVER (ORDER BY m) AS rn FROM rep_means
        ), ci AS (
            SELECT max(CASE WHEN rn = 3 THEN m END) AS lo,
                   max(CASE WHEN rn = 98 THEN m END) AS hi
            FROM ranked
        )
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               round(avg(value), 6) AS mean,
               round((SELECT lo FROM ci), 6) AS ci_lo,
               round((SELECT hi FROM ci), 6) AS ci_hi,
               100 AS n_replicates
        FROM events
    """,
    "m39_nelson_aalen": """
        WITH spans AS (
            SELECT user_id, min(ts) AS fts, max(ts) AS lts
            FROM events GROUP BY 1
        ), ferr AS (
            SELECT user_id, min(ts) AS ets FROM events
            WHERE event_type = 'error' GROUP BY 1
        ), subjects AS (
            SELECT CAST(floor((epoch_us(coalesce(ets, lts)) - epoch_us(fts))
                              / 3600000000.0) AS BIGINT) AS duration,
                   CASE WHEN ets IS NOT NULL THEN 1 ELSE 0 END AS event
            FROM spans LEFT JOIN ferr USING (user_id)
        ), per_t AS (
            SELECT duration AS t, CAST(sum(event) AS BIGINT) AS d,
                   count(*) AS leaving
            FROM subjects GROUP BY 1
        ), at_risk AS (
            SELECT t, d, (SELECT count(*) FROM subjects)
                   - coalesce(sum(leaving) OVER (ORDER BY t
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS n_risk
            FROM per_t
        ), steps AS (SELECT * FROM at_risk WHERE d > 0)
        SELECT t, CAST(n_risk AS BIGINT) AS n_risk,
               d AS d_events,
               round(sum(d / CAST(n_risk AS DOUBLE))
                     OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW), 6) AS cum_hazard,
               round(sum(d / (CAST(n_risk AS DOUBLE) * CAST(n_risk AS DOUBLE)))
                     OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW), 6) AS var_hazard
        FROM steps
    """,
    "q_rank_fusion": """
        WITH spend AS (
            SELECT o_custkey, sum(o_totalprice) AS s
            FROM orders GROUP BY 1
        ), recency AS (
            SELECT o_custkey, max(o_orderdate) AS r
            FROM orders GROUP BY 1
        ), la AS (
            SELECT o_custkey AS c_custkey,
                   row_number() OVER (ORDER BY s DESC, o_custkey) AS rnk
            FROM spend ORDER BY s DESC, o_custkey LIMIT 100
        ), lb AS (
            SELECT o_custkey AS c_custkey,
                   row_number() OVER (ORDER BY r DESC, o_custkey) AS rnk
            FROM recency ORDER BY r DESC, o_custkey LIMIT 100
        ), u AS (
            SELECT * FROM la UNION ALL SELECT * FROM lb
        )
        SELECT c_custkey,
               round(sum(CAST(1 AS DOUBLE) / (60 + rnk)), 6) AS rrf_score,
               CAST(count(*) AS BIGINT) AS n_lists
        FROM u GROUP BY 1
        ORDER BY rrf_score DESC, c_custkey LIMIT 25
    """,
    "m40_psm_att": """
        -- independent algorithm: brute-force argmin over the distinct
        -- control-score frame (the engine uses union-sort-carry)
        WITH base AS (
            SELECT c_custkey AS uid,
                   CASE WHEN c_custkey % 3 = 0 THEN 1 ELSE 0 END AS t,
                   CAST((c_custkey * 131) % 1009 AS DOUBLE) / 1009.0 AS s,
                   c_acctbal AS y
            FROM customer
        ), ctl AS (
            -- one control per distinct score: min-(id, outcome) survivor,
            -- matching the engine's deterministic collapse
            SELECT s AS cs, min({'uid': uid, 'y': y}) AS cv
            FROM base WHERE t = 0 GROUP BY s
        ), cand AS (
            SELECT tr.uid, tr.s, tr.y,
                   c.cs, (c.cv).y AS cy,
                   row_number() OVER (
                       PARTITION BY tr.uid
                       ORDER BY abs(tr.s - c.cs), c.cs
                   ) AS rn
            FROM (SELECT * FROM base WHERE t = 1) tr CROSS JOIN ctl c
        ), pairs AS (SELECT * FROM cand WHERE rn = 1)
        SELECT CAST(count(*) AS BIGINT) AS n_matched,
               round(avg(y - cy), 6) AS att,
               round(avg(y), 6) AS mean_treated,
               round(avg(cy), 6) AS mean_control
        FROM pairs
    """,
    "m41_did": """
        WITH cells AS (
            SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS t,
                   CASE WHEN extract('hour' FROM ts) >= 12 THEN 1 ELSE 0 END AS p,
                   avg(value) AS m, count(*) AS n
            FROM events GROUP BY 1, 2
        ), wide AS (
            SELECT max(CASE WHEN t = 1 AND p = 0 THEN m END) AS treat_pre,
                   max(CASE WHEN t = 1 AND p = 1 THEN m END) AS treat_post,
                   max(CASE WHEN t = 0 AND p = 0 THEN m END) AS ctl_pre,
                   max(CASE WHEN t = 0 AND p = 1 THEN m END) AS ctl_post,
                   CAST(coalesce(max(CASE WHEN t = 1 AND p = 0 THEN n END), 0) AS BIGINT) AS n_treat_pre,
                   CAST(coalesce(max(CASE WHEN t = 1 AND p = 1 THEN n END), 0) AS BIGINT) AS n_treat_post,
                   CAST(coalesce(max(CASE WHEN t = 0 AND p = 0 THEN n END), 0) AS BIGINT) AS n_ctl_pre,
                   CAST(coalesce(max(CASE WHEN t = 0 AND p = 1 THEN n END), 0) AS BIGINT) AS n_ctl_post
            FROM cells
        )
        SELECT round(treat_pre, 6) AS treat_pre,
               round(treat_post, 6) AS treat_post,
               round(ctl_pre, 6) AS ctl_pre,
               round(ctl_post, 6) AS ctl_post,
               n_treat_pre, n_treat_post, n_ctl_pre, n_ctl_post,
               round((treat_post - treat_pre) - (ctl_post - ctl_pre), 6) AS did
        FROM wide
    """,
    "m42_qini": """
        WITH base AS (
            SELECT c_custkey AS uid,
                   CASE WHEN c_custkey % 2 = 0 THEN 1 ELSE 0 END AS t,
                   CAST((c_custkey * 53) % 997 AS DOUBLE) / 997.0 AS s,
                   CAST(CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END AS DOUBLE) AS y
            FROM customer
        ), ranked AS (
            SELECT *, row_number() OVER (ORDER BY s DESC, uid) AS rn,
                   count(*) OVER () AS n
            FROM base
        ), binned AS (
            SELECT CAST(ceil(rn * 10.0 / n) AS INT) AS bin, t, y FROM ranked
        ), per_bin AS (
            SELECT bin, count(*) AS nb,
                   sum(CASE WHEN t = 1 THEN y ELSE 0.0 END) AS yt,
                   sum(t) AS nt,
                   sum(CASE WHEN t = 0 THEN y ELSE 0.0 END) AS yc,
                   sum(1 - t) AS nc
            FROM binned GROUP BY 1
        ), cum AS (
            SELECT bin,
                   CAST(sum(nb) OVER w AS BIGINT) AS n_cum,
                   sum(yt) OVER w AS cum_y_treat,
                   CAST(sum(nt) OVER w AS BIGINT) AS cum_n_treat,
                   sum(yc) OVER w AS cum_y_ctl,
                   CAST(sum(nc) OVER w AS BIGINT) AS cum_n_ctl
            FROM per_bin
            WINDOW w AS (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)
        )
        SELECT bin, n_cum,
               round(cum_y_treat, 6) AS cum_y_treat, cum_n_treat,
               round(cum_y_ctl, 6) AS cum_y_ctl, cum_n_ctl,
               round(cum_y_treat - cum_y_ctl
                     * (CAST(cum_n_treat AS DOUBLE)
                        / nullif(CAST(cum_n_ctl AS DOUBLE), 0)), 6) AS qini
        FROM cum ORDER BY bin
    """,
}

# ---------------------------------------------------------------- round-5 oracles

_KAPPA_LANG_PRED = f"""
        t AS (SELECT lang, {_TOKS} AS tk FROM documents),
        h AS (
            SELECT lang,
                   len(list_filter(tk, x -> list_contains({_EN}, x))) AS he,
                   len(list_filter(tk, x -> list_contains({_DE}, x))) AS hd,
                   len(list_filter(tk, x -> list_contains({_FR}, x))) AS hf,
                   len(list_filter(tk, x -> list_contains({_ES}, x))) AS hs
            FROM t
        ),
        p AS (
            SELECT lang AS a,
                   CASE WHEN greatest(he, hd, hf, hs) = 0 THEN 'und'
                        WHEN hf = greatest(he, hd, hf, hs) THEN 'fr'
                        WHEN hs = greatest(he, hd, hf, hs) THEN 'es'
                        WHEN he = greatest(he, hd, hf, hs) THEN 'en'
                        ELSE 'de' END AS b
            FROM h
        )
"""

_ACF_LAG_MEMBER = """
        SELECT CAST({k} AS INT) AS lag,
               CAST(count(*) AS BIGINT) AS n_pairs,
               round(sum((x - m) * (l{k} - m)) / any_value(ss), 6) AS acf
        FROM l, b WHERE l{k} IS NOT NULL
        HAVING count(*) > 0  -- engine's groupBy drops 0-pair lags on short series
"""

ALL_ORACLES.update(
    {
        "p36_cramers_v": """
            WITH obs AS (
                SELECT o_orderpriority AS a, o_orderstatus AS b, count(*) AS o
                FROM orders
                WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL
                GROUP BY 1, 2
            ),
            t AS (SELECT CAST(sum(o) AS DOUBLE) AS n FROM obs),
            ma AS (SELECT a, CAST(sum(o) AS DOUBLE) AS ra FROM obs GROUP BY 1),
            mb AS (SELECT b, CAST(sum(o) AS DOUBLE) AS cb FROM obs GROUP BY 1),
            cells AS (
                SELECT o, n, ra * cb / n AS e
                FROM obs JOIN ma USING (a) JOIN mb USING (b), t
            ),
            agg AS (
                -- empty-cell-complete chi2: sum_obs((o-e)²/e - e) + n
                SELECT any_value(n) AS n,
                       sum((o - e) * (o - e) / e - e) + any_value(n) AS chi2
                FROM cells
            ),
            k AS (SELECT least((SELECT count(*) - 1 FROM ma),
                               (SELECT count(*) - 1 FROM mb)) AS kk)
            SELECT CAST(n AS BIGINT) AS n,
                   round(chi2, 6) AS chi2,
                   CAST((SELECT count(*) - 1 FROM ma)
                        * (SELECT count(*) - 1 FROM mb) AS BIGINT) AS dof,
                   round(sqrt(chi2 / (n * CAST(kk AS DOUBLE))), 6) AS cramers_v
            FROM agg, k
        """,
        "m43_cohens_kappa": f"""
            WITH {_KAPPA_LANG_PRED.strip()},
            obs AS (SELECT a, b, count(*) AS o FROM p GROUP BY 1, 2),
            ma AS (SELECT a, CAST(sum(o) AS DOUBLE) AS ra FROM obs GROUP BY 1),
            mb AS (SELECT b, CAST(sum(o) AS DOUBLE) AS cb FROM obs GROUP BY 1),
            base AS (
                SELECT CAST(sum(o) AS DOUBLE) AS n,
                       CAST(sum(CASE WHEN a = b THEN o ELSE 0 END) AS DOUBLE) AS agree
                FROM obs
            ),
            pe_ AS (
                SELECT coalesce(sum(ra * cb), 0.0) AS pe_num
                FROM ma JOIN mb ON ma.a = mb.b
            )
            SELECT CAST(n AS BIGINT) AS n,
                   round(agree / n, 6) AS po,
                   round(pe_num / (n * n), 6) AS pe,
                   round((agree / n - pe_num / (n * n))
                         / nullif(1 - pe_num / (n * n), 0), 6) AS kappa
            FROM base, pe_
        """,
        "q_acf": f"""
            WITH s AS (
                SELECT strftime(l_shipdate, '%Y-%m-%d') AS d,
                       sum(l_quantity) AS x
                FROM lineitem GROUP BY 1
            ),
            b AS (SELECT avg(x) AS m, var_pop(x) * count(*) AS ss FROM s),
            l AS (
                SELECT x,
                       lag(x, 1) OVER (ORDER BY d) AS l1,
                       lag(x, 2) OVER (ORDER BY d) AS l2,
                       lag(x, 3) OVER (ORDER BY d) AS l3,
                       lag(x, 4) OVER (ORDER BY d) AS l4,
                       lag(x, 5) OVER (ORDER BY d) AS l5
                FROM s
            )
            {" UNION ALL ".join(_ACF_LAG_MEMBER.format(k=k) for k in range(1, 6))}
            ORDER BY lag
        """,
    }
)

ALL_ORACLES.update(
    {
        "q_adamic_adar": """
            WITH e AS (
                SELECT DISTINCT o_custkey AS u, l_partkey AS v
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            ),
            deg AS (SELECT v, count(*) AS d FROM e GROUP BY 1),
            ew AS (SELECT u, e.v, d FROM e JOIN deg USING (v) WHERE d >= 2),
            p AS (
                SELECT a.v, a.u AS ua, b.u AS ub, a.d
                FROM ew a JOIN ew b ON a.v = b.v AND a.u < b.u
            )
            SELECT ua, ub,
                   CAST(count(*) AS BIGINT) AS n_common,
                   round(sum(1.0 / ln(d)), 6) AS aa_score
            FROM p GROUP BY 1, 2
            ORDER BY aa_score DESC, ua, ub
            LIMIT 20
        """,
    }
)

ALL_ORACLES["tx_bigram_lm"] = f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    bg AS (
        SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
        FROM t, unnest(generate_series(1, len(tk) - 1)) AS g(i)
    ),
    c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
    c1 AS (
        SELECT w AS w1, count(*) AS c1
        FROM t, unnest(tk) AS u(w) GROUP BY 1
    ),
    v AS (SELECT CAST(count(*) AS DOUBLE) AS vs FROM c1),
    scored AS (
        SELECT doc_id,
               -ln((c2 + 1.0) / (c1 + vs)) AS nlp
        FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1), v
    ),
    per_doc AS (
        SELECT doc_id, count(*) AS n, round(avg(nlp), 6) AS s
        FROM scored GROUP BY 1
    )
    SELECT d.doc_id AS id,
           CAST(coalesce(n, 0) AS BIGINT) AS n_bigrams,
           s AS avg_neg_logp2
    FROM documents d LEFT JOIN per_doc USING (doc_id)
    ORDER BY id
"""

ALL_ORACLES.update(
    {
        "ss_scalar_quantize": """
            WITH ed AS (
                SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
                FROM embeddings,
                     unnest(generate_series(1, len(embedding))) AS g(i)
            ),
            rng AS (SELECT i, min(x) AS mn, max(x) AS mx FROM ed GROUP BY 1),
            q AS (
                SELECT vec_id,
                       CASE WHEN mx > mn
                            THEN least(floor((x - mn) / (mx - mn) * 256), 255)
                            ELSE 0 END AS c,
                       x, mn, mx
                FROM ed JOIN rng USING (i)
            ),
            r AS (
                SELECT vec_id,
                       c,
                       abs(x - (mn + (c + 0.5) / 256.0 * (mx - mn))) AS e
                FROM q
            ),
            per_vec AS (
                SELECT vec_id, CAST(sum(c) AS BIGINT) AS cs, max(e) AS me
                FROM r GROUP BY 1
            )
            SELECT CAST(count(*) AS BIGINT) AS n_vecs,
                   CAST(sum(cs) AS BIGINT) AS codes_sum,
                   round(avg(me), 6) AS avg_max_err,
                   round(max(me), 6) AS worst_err
            FROM per_vec
        """,
        "q_semi_additive": """
            WITH ranked AS (
                SELECT strftime(o_orderdate, '%Y-%m') AS month,
                       o_custkey, o_totalprice,
                       row_number() OVER (
                           PARTITION BY o_custkey, strftime(o_orderdate, '%Y-%m')
                           ORDER BY o_orderdate DESC, o_orderkey DESC
                       ) AS rn
                FROM orders
            )
            SELECT month,
                   CAST(count(*) AS BIGINT) AS n_customers,
                   round(sum(o_totalprice), 2) AS closing_balance
            FROM ranked WHERE rn = 1
            GROUP BY month ORDER BY month
        """,
    }
)

ALL_ORACLES.update(
    {
        "m44_logrank": """
            WITH spans AS (
                SELECT user_id, min(ts) AS fts, max(ts) AS lts
                FROM events GROUP BY 1
            ), ferr AS (
                SELECT user_id, min(ts) AS ets FROM events
                WHERE event_type = 'error' GROUP BY 1
            ), subjects AS (
                SELECT CAST(user_id % 2 AS INT) AS arm,
                       CAST(floor((epoch_us(coalesce(ets, lts)) - epoch_us(fts))
                                  / 3600000000.0) AS BIGINT) AS t,
                       CASE WHEN ets IS NOT NULL THEN 1 ELSE 0 END AS e
                FROM spans LEFT JOIN ferr USING (user_id)
            ), per_t AS (
                SELECT t,
                       sum(CASE WHEN arm = 0 AND e = 1 THEN 1 ELSE 0 END) AS d1,
                       sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS l1,
                       sum(CASE WHEN arm = 1 AND e = 1 THEN 1 ELSE 0 END) AS d2,
                       sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS l2
                FROM subjects GROUP BY 1
            ), at_risk AS (
                SELECT t, d1, d2,
                       sum(l1) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW
                                     AND UNBOUNDED FOLLOWING) AS n1,
                       sum(l2) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW
                                     AND UNBOUNDED FOLLOWING) AS n2
                FROM per_t
            ), terms AS (
                SELECT d1, n1, n2,
                       (d1 + d2) AS d,
                       CAST(n1 + n2 AS DOUBLE) AS n
                FROM at_risk
            ), agg AS (
                SELECT CAST(max(n1) AS BIGINT) AS n_a,
                       CAST(max(n2) AS BIGINT) AS n_b,
                       CAST(sum(d1) AS BIGINT) AS observed_a,
                       sum(d * n1 / n) AS e1,
                       sum(d1 - d * n1 / n) AS oe,
                       sum(coalesce(d * (n1 / n) * (1 - n1 / n) * (n - d)
                                    / nullif(n - 1, 0), 0)) AS v
                FROM terms
            )
            SELECT n_a, n_b, observed_a,
                   round(e1, 6) AS expected_a,
                   round(oe * oe / nullif(v, 0), 6) AS chi2
            FROM agg
        """,
        "m45_mannwhitney": """
            WITH pv AS (
                SELECT l_quantity AS v,
                       sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS ca,
                       sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS cb
                FROM lineitem
                WHERE l_returnflag IN ('A', 'R') AND l_quantity IS NOT NULL
                GROUP BY 1
            ), r AS (
                SELECT ca, cb, (ca + cb) AS t,
                       CAST(coalesce(sum(ca + cb) OVER (ORDER BY v
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS DOUBLE)
                           + (ca + cb + 1) / 2.0 AS avg_rank
                FROM pv
            ), a AS (
                SELECT CAST(sum(ca) AS BIGINT) AS n_a,
                       CAST(sum(cb) AS BIGINT) AS n_b,
                       sum(ca * avg_rank) AS ra,
                       sum(CAST(t AS DOUBLE) * t * t - t) AS ties
                FROM r
            )
            SELECT n_a, n_b,
                   round(ra - n_a * (n_a + 1) / 2.0, 6) AS u_a,
                   round((ra - n_a * (n_a + 1) / 2.0 - n_a * n_b / 2.0)
                         / nullif(sqrt(n_a * n_b / 12.0
                             * ((n_a + n_b + 1)
                                - ties / nullif(CAST(n_a + n_b AS DOUBLE)
                                                * (n_a + n_b - 1), 0))), 0),
                         6) AS z
            FROM a
        """,
        "m46_cuped": """
            WITH per_user AS (
                SELECT user_id,
                       coalesce(sum(CASE WHEN ts < TIMESTAMP '2024-01-16'
                                         THEN value END), 0.0) AS x,
                       coalesce(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                                         THEN value END), 0.0) AS y
                FROM events GROUP BY 1
            )
            SELECT CAST(count(*) AS BIGINT) AS n,
                   round(covar_pop(x, y) / nullif(var_pop(x), 0), 6) AS theta,
                   round(covar_pop(x, y) * covar_pop(x, y)
                         / nullif(var_pop(x) * var_pop(y), 0), 6) AS var_reduction
            FROM per_user
        """,
    }
)

ALL_ORACLES.update(
    {
        # round-trip gates: the oracle states the TRUTH from the source
        # table; the engine's value must survive the sink→scan cycle
        "s24_partitioned_write": """
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
                   round(sum(round(value, 6)), 4) AS total_value
            FROM events
            WHERE event_type = 'purchase'
            GROUP BY event_type
        """,
        "s25_bucketed_join": """
            SELECT CAST(count(*) AS BIGINT) AS n_rows,
                   round(sum(floor(l_extendedprice * (1 - l_discount) * 100) / 100.0), 2)
                       AS total_rev,
                   CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        """,
    }
)

ALL_ORACLES["ml_dbscan"] = """
    WITH RECURSIVE n AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)
                   / sqrt(list_sum(list_transform(embedding,
                         y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS nv
        FROM embeddings
    ),
    p0 AS (
        SELECT a.vec_id AS ia, b.vec_id AS ib
        FROM n a JOIN n b ON a.vec_id < b.vec_id
        WHERE round(list_dot_product(a.nv, b.nv), 6) >= 0.3
    ),
    sym AS (SELECT ia AS u, ib AS v FROM p0 UNION SELECT ib, ia FROM p0),
    deg AS (SELECT u, count(*) AS d FROM sym GROUP BY 1),
    core AS (SELECT u AS c FROM deg WHERE d + 1 >= 4),
    ce AS (
        SELECT s.u AS a, s.v AS b
        FROM sym s JOIN core c1 ON s.u = c1.c JOIN core c2 ON s.v = c2.c
    ),
    reach AS (
        SELECT a AS id, a AS r FROM ce
        UNION
        SELECT reach.id, e.b FROM reach JOIN ce e ON e.a = reach.r
    ),
    comp AS (SELECT id, min(r) AS component FROM reach GROUP BY 1),
    core_lab AS (
        SELECT c.c AS id, CAST(coalesce(comp.component, c.c) AS BIGINT) AS label
        FROM core c LEFT JOIN comp ON comp.id = c.c
    ),
    border AS (
        SELECT s.u AS id, CAST(min(cl.label) AS BIGINT) AS label
        FROM sym s JOIN core_lab cl ON s.v = cl.id
        WHERE s.u NOT IN (SELECT id FROM core_lab)
        GROUP BY 1
    ),
    lab AS (
        SELECT id, label, true AS is_core FROM core_lab
        UNION ALL
        SELECT id, label, false AS is_core FROM border
    )
    SELECT e.vec_id, lab.label, coalesce(lab.is_core, false) AS is_core
    FROM embeddings e LEFT JOIN lab ON lab.id = e.vec_id
    ORDER BY e.vec_id
"""

# m23 upgraded r5: exact PAV via the minimax identity — every arithmetic
# step (sequential prefix sums, one ratio, min/max) mirrors the driver-side
# closed form bit-for-bit. O(n_bins^3) triples = ~22k rows at n_bins=50.
ALL_ORACLES["m23_isotonic_calibration"] = f"""
    WITH {_AUC_BASE_SQL},
    binned AS (
        SELECT least(floor(s * 50), 49) AS b,
               avg(s) AS sc, avg(CAST(y AS DOUBLE)) AS pr,
               CAST(count(*) AS DOUBLE) AS w
        FROM base GROUP BY 1
    ),
    ord AS (SELECT row_number() OVER (ORDER BY b) AS rn, sc, pr, w FROM binned),
    pre AS (
        SELECT rn, sc, pr,
               sum(w * pr) OVER (ORDER BY rn) AS cwy,
               sum(w) OVER (ORDER BY rn) AS cw
        FROM ord
    ),
    trip AS (
        SELECT k.rn AS k, i.rn AS i,
               (j.cwy - coalesce(ip.cwy, 0)) / (j.cw - coalesce(ip.cw, 0)) AS a
        FROM pre k
        JOIN pre i ON i.rn <= k.rn
        JOIN pre j ON j.rn >= k.rn
        LEFT JOIN pre ip ON ip.rn = i.rn - 1
    ),
    mins AS (SELECT k, i, min(a) AS m FROM trip GROUP BY 1, 2),
    fit AS (SELECT k, max(m) AS f FROM mins GROUP BY 1)
    SELECT round(p.sc, 6) AS score_center,
           round(p.pr, 6) AS raw_pos_rate,
           round(f.f, 6) AS calibrated_p
    FROM pre p JOIN fit f ON f.k = p.rn
    ORDER BY score_center
"""

# the stored-index incremental path answers to the same full-recompute
# contract as dd_incremental_pairs, but with an SF-PROPORTIONAL batch
# (every 10th doc) so the gate exercises the small-batch-vs-big-corpus
# shape the stored index exists for at every scale
ALL_ORACLES["dd_incremental_indexed"] = f"""
    WITH {_NGRAM_PAIRS_J}
    SELECT id_a, id_b, jaccard
    FROM j
    WHERE jaccard >= 0.2 AND (id_a % 10 = 0 OR id_b % 10 = 0)
    ORDER BY id_a, id_b
"""

# I6 random-forest estimator: the contract (no nulls survive, rows
# preserved, clip keeps fills inside the observed range) is exact even
# though the forest's values are not SQL-replayable
ALL_ORACLES["i6_mice_rf"] = """
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(0 AS BIGINT) AS nulls_q,
           CAST(0 AS BIGINT) AS n_out_of_range
    FROM lineitem
"""

# -------------------------------------------------- round-8 sink/ML gates
# the md5-bucket split predicate shared with t8_hash_split (proven
# engine-identical there); 2500/10000 = the gates' test_frac 0.25
_HASH_IS_TEST = (
    "(CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8)) AS BIGINT)"
    " % 10000) < 2500"
)

ALL_ORACLES["f10_dtype_align"] = """
    SELECT TRY_CAST(CAST(c_custkey AS VARCHAR) AS BIGINT) AS c_custkey,
           TRY_CAST(CAST(c_acctbal AS VARCHAR) AS DOUBLE) AS c_acctbal,
           TRY_CAST(c_mktsegment AS DOUBLE) AS c_mktsegment
    FROM customer ORDER BY c_custkey
"""

ALL_ORACLES["f11_header_strip"] = """
    SELECT c_custkey, c_name, c_mktsegment FROM customer ORDER BY c_custkey
"""

ALL_ORACLES["e17_label_round"] = """
    SELECT c_custkey,
           CAST(round(c_nationkey
                      + CASE WHEN c_custkey % 2 = 0 THEN 0.25 ELSE 0.75 END)
                AS INT) AS label
    FROM customer ORDER BY c_custkey
"""

# schema-metadata oracle: the numeric projection derived from
# information_schema over the registered view, not a hard-coded list
ALL_ORACLES["f12_feature_projection"] = """
    SELECT column_name AS feature
    FROM information_schema.columns
    WHERE table_name = 'customer'
      AND data_type IN ('TINYINT', 'SMALLINT', 'INTEGER', 'BIGINT',
                        'HUGEINT', 'FLOAT', 'DOUBLE', 'DECIMAL')
      AND column_name <> 'c_acctbal'
    ORDER BY feature
"""

ALL_ORACLES["m1_scaler_stats"] = f"""
    SELECT f.feature,
           (SELECT count(*) FROM customer WHERE NOT {_HASH_IS_TEST}) AS n_train,
           TRUE AS mu_is_train_mean,
           TRUE AS sigma_is_train_std
    FROM (VALUES ('c_acctbal'), ('c_nationkey')) f(feature)
    ORDER BY f.feature
"""

ALL_ORACLES["s7_paired_sink"] = f"""
    SELECT c_custkey, c_nationkey, c_acctbal, c_mktsegment,
           CASE WHEN {_HASH_IS_TEST} THEN 'test' ELSE 'train' END AS split,
           TRUE AS gate_ok
    FROM customer ORDER BY c_custkey
"""

ALL_ORACLES["s9_version_lineage"] = """
    SELECT 0 AS version, (SELECT count(*) FROM customer) AS n_rows,
           1 AS n_changes, -1 AS parent, 0 AS parsed_version, 'cust' AS base
    UNION ALL
    SELECT 1, (SELECT count(*) FROM customer WHERE c_acctbal > 0),
           1, 0, 1, 'cust'
"""

ALL_ORACLES["s12_description_sidecar"] = """
    SELECT col_name, CAST(n AS VARCHAR) || ' distinct values' AS description
    FROM (
        SELECT 'c_custkey' AS col_name, count(DISTINCT c_custkey) AS n FROM customer
        UNION ALL
        SELECT 'c_mktsegment', count(DISTINCT c_mktsegment) FROM customer
        UNION ALL
        SELECT 'c_nationkey', count(DISTINCT c_nationkey) FROM customer
    )
    ORDER BY col_name
"""

ALL_ORACLES["m11_model_roundtrip"] = f"""
    SELECT (SELECT count(*) FROM customer WHERE {_HASH_IS_TEST}) AS n_test,
           CAST(0 AS BIGINT) AS n_pred_mismatch,
           TRUE AS params_ok
"""

ALL_ORACLES["m13_scorer_suite"] = """
    SELECT 'classification' AS task_cls, 'regression' AS task_reg,
           5 AS n_cls_metrics, TRUE AS acc_exact
"""

ALL_ORACLES["b10_bagging_floor"] = f"""
    SELECT (SELECT count(*) FROM customer WHERE {_HASH_IS_TEST}) AS n_test,
           20 AS n_trees, TRUE AS acc_ge_floor
"""

ALL_ORACLES["m10_importance_roundtrip"] = """
    SELECT 'c_acctbal' AS top_feature, 1 AS top_rank,
           (SELECT CAST(3 AS BIGINT)) AS n_features,
           'logistic_regression' AS model
"""

ALL_ORACLES["m7_tpe_trials"] = """
    SELECT CAST(range AS INT) AS trial, TRUE AS mean_le_best,
           TRUE AS param_in_bounds
    FROM range(6) ORDER BY trial
"""

# re-aggregatable HLL sketches: shard-merge losslessness and the 5% bound
# are asserted in-query (sketch internals aren't SQL-replayable); the
# oracle owns the exact distinct count the bound is measured against
ALL_ORACLES["p37_hll_shard_merge"] = """
    SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_distinct,
           TRUE AS merge_matches_single, TRUE AS within_5pct
    FROM lineitem
"""

# streaming dedup parity: the doubled-stream dedup must reproduce the
# original table's per-type aggregate exactly
ALL_ORACLES["st_stream_dedup"] = """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 6) AS total_value
    FROM events GROUP BY event_type ORDER BY event_type
"""

# stateful running stats: the final per-user state equals the batch aggregate
ALL_ORACLES["st_stateful_running"] = """
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 6) AS total_value,
           round(max(value), 6) AS max_value
    FROM events GROUP BY user_id ORDER BY user_id
"""

# exact linear SHAP (round 9): the OLS fit is solver='normal' (closed-form
# normal equations), so DuckDB reproduces the coefficients symbolically from
# the 2-feature covariance system; mean |phi_i| = |b_i| * mean|x_i - mean_i|,
# the base value is the OLS identity f(E[x]) = mean(y), and additivity is
# identically zero in exact algebra (the Spark side rounds its float
# residual to the same 0.0).
# identical semantics across all three i4 gates — ONE oracle, aliased
# (r11: the three byte-identical copies were the drift hazard the file's
# own st_stream_join alias idiom exists to avoid): i4_interpolate
# (headline, ranged impl since r6), i4_interpolate_ranged (continuity
# alias), i4_interpolate_single (one-task baseline)
ALL_ORACLES["i4_interpolate_ranged"] = ALL_ORACLES["i4_interpolate"]
ALL_ORACLES["i4_interpolate_single"] = ALL_ORACLES["i4_interpolate"]
# r14: same idiom for the sweep line — q_max_concurrency is the ranged
# headline, q_max_concurrency_single the global-window baseline, one oracle
ALL_ORACLES["q_max_concurrency_single"] = ALL_ORACLES["q_max_concurrency"]

# r14: DBSCAN on the IVF candidate path — contract-attestation oracle (the
# b8/b9 pattern): labels are candidate-recall dependent (engine-only), so
# the oracle pins the point count from the data plus the all-TRUE
# consistency contract the gate attests edge-wise against its own graph.
ALL_ORACLES["ml_dbscan_ivf"] = """
    SELECT CAST(count(*) AS BIGINT) AS n_points,
           TRUE AS core_all_labeled,
           TRUE AS border_label_is_min_core_neighbor,
           TRUE AS noise_has_no_core_neighbor,
           TRUE AS core_edges_label_consistent,
           TRUE AS found_clusters
    FROM embeddings
"""

ALL_ORACLES["m10_linear_shap"] = """
    WITH st AS (
        SELECT avg(l_quantity) AS m1, avg(l_discount) AS m2,
               avg(l_extendedprice) AS my,
               var_pop(l_quantity) AS v11, var_pop(l_discount) AS v22,
               covar_pop(l_quantity, l_discount) AS v12,
               covar_pop(l_quantity, l_extendedprice) AS c1,
               covar_pop(l_discount, l_extendedprice) AS c2,
               count(*) AS n
        FROM lineitem
    ), b AS (
        SELECT m1, m2, my, n,
               (c1 * v22 - c2 * v12) / (v11 * v22 - v12 * v12) AS b1,
               (c2 * v11 - c1 * v12) / (v11 * v22 - v12 * v12) AS b2
        FROM st
    ), d AS (
        SELECT avg(abs(l_quantity - (SELECT m1 FROM b))) AS d1,
               avg(abs(l_discount - (SELECT m2 FROM b))) AS d2
        FROM lineitem
    )
    SELECT round(abs(b.b1) * d.d1, 2) AS mas_quantity,
           round(abs(b.b2) * d.d2, 2) AS mas_discount,
           round(b.my, 2) AS base_value,
           CAST(0.0 AS DOUBLE) AS additivity_err,
           CAST(b.n AS BIGINT) AS n_rows
    FROM b, d
"""

# M14 soft-cancel: the gate's three outcomes are hard booleans when
# cancellation works — surfaced in the launching thread, killed well under
# the uncancelled duration, no orphaned jobs in the group.
ALL_ORACLES["m14_soft_cancel"] = """
    SELECT TRUE AS cancel_surfaced, TRUE AS cancelled_fast, TRUE AS no_orphans
"""

# stream-stream interval join parity: the streaming attribution pairs must
# equal the batch interval join exactly — LITERALLY the same oracle, so
# the two can never drift apart (r9 review)
ALL_ORACLES["st_stream_join"] = ALL_ORACLES["q_attribution"]

# append-half of the stored-index incremental flow: after appending batch1
# the stored index is corpus ∪ batch1, so batch2's probe equals the full
# exact recompute filtered to batch2-touching pairs
ALL_ORACLES["dd_incremental_append"] = f"""
    WITH {_NGRAM_PAIRS_J}
    SELECT id_a, id_b, jaccard
    FROM j
    WHERE jaccard >= 0.2 AND (id_a % 10 = 5 OR id_b % 10 = 5)
    ORDER BY id_a, id_b
"""


# ---------------------------------------------------------------- round-11
# rows-only graduations (VERDICT r10 item 4)

# M12 single-row inference: the pipeline's LinearRegression(solver='normal',
# regParam=0) is closed-form OLS, and OLS predictions are invariant to the
# StandardScaler stage, so the scored row replays from covar_pop algebra
# (the m10_linear_shap 2-feature symbolic inverse) with no scaler knowledge:
# pred = b0 + b1*25 + b2*0.05 at the gate's fixed row.
ALL_ORACLES["m12_single_row_inference"] = """
    WITH st AS (
        SELECT avg(l_quantity) AS m1, avg(l_discount) AS m2,
               avg(l_extendedprice) AS my,
               var_pop(l_quantity) AS v11, var_pop(l_discount) AS v22,
               covar_pop(l_quantity, l_discount) AS v12,
               covar_pop(l_quantity, l_extendedprice) AS c1,
               covar_pop(l_discount, l_extendedprice) AS c2
        FROM lineitem
    ), b AS (
        SELECT my, m1, m2,
               (c1 * v22 - c2 * v12) / (v11 * v22 - v12 * v12) AS b1,
               (c2 * v11 - c1 * v12) / (v11 * v22 - v12 * v12) AS b2
        FROM st
    )
    SELECT round(my + b1 * (CAST(25.0 AS DOUBLE) - m1)
                    + b2 * (CAST(0.05 AS DOUBLE) - m2), 2) AS prediction
    FROM b
"""


def _sql_double_array(vals: list[float]) -> str:
    """Render a Python float list as a DuckDB DOUBLE[] literal. %.17e
    scientific notation round-trips every IEEE double exactly AND parses
    as DOUBLE directly (a plain decimal literal would parse as DECIMAL)."""
    return "[" + ", ".join("%.17e" % v for v in vals) + "]"


def _ss_cosine_pairs_oracle() -> str:
    """ss_cosine_pairs graduated to full hash parity: the sign-LSH planes
    are a deterministic LCG stream (similarity.lsh_planes — imported, not
    copied, so the recurrence lives in one place) embedded here as exact
    DOUBLE literals; bucket bit i = (dot(e, plane_i) >= 0) * 2^i, pairs
    join within buckets, and the verify is the exact raw-vector cosine
    dot/(|a||b|) rounded 6dp — the list_dot_product recipe proven by the
    r10 ss_semantic_dedup twin. Gate params: dim=64, n_planes=4,
    threshold=0.3, seed=42 (queries.ss_cosine_pairs)."""
    from ml_data_pipeline_spark.operators.similarity import lsh_planes

    planes = lsh_planes(seed=42, n_planes=4, dim=64)
    bits = "\n             + ".join(
        f"CASE WHEN list_dot_product(e, {_sql_double_array(p)}) >= 0 "
        f"THEN {1 << i} ELSE 0 END"
        for i, p in enumerate(planes)
    )
    return f"""
    WITH base AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    ),
    bucketed AS (
        SELECT vec_id, e,
               ({bits}) AS bucket
        FROM base
    ),
    cand AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_dot_product(a.e, b.e)
                     / (sqrt(list_dot_product(a.e, a.e))
                        * sqrt(list_dot_product(b.e, b.e))), 6) AS cosine
        FROM bucketed a JOIN bucketed b
          ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, cosine
    FROM cand
    WHERE cosine >= 0.3
    ORDER BY id_a, id_b
"""


ALL_ORACLES["ss_cosine_pairs"] = _ss_cosine_pairs_oracle()


def _ss_ann_topk_oracle() -> str:
    """ss_ann_topk graduated to full hash parity (r11): everything in the
    gate is deterministic — the sign-LSH planes are the same LCG stream
    the ss_cosine_pairs oracle replays (6 planes at dim 64 here), the
    query vector is the vec_id=0 embedding, the multi-probe restriction
    is bit_count(xor(bucket, query_bucket)) <= 2, the verify is the exact
    cosine (ss_brute_topk's proven recipe), and ties break on vec_id.
    The recall@10-vs-brute-force quality floor is replayed verbatim, so
    the oracle also re-derives the exact top-10 and the recall join."""
    from ml_data_pipeline_spark.operators.similarity import lsh_planes

    planes = lsh_planes(seed=42, n_planes=6, dim=64)
    bits = "\n               + ".join(
        f"CASE WHEN list_dot_product(e, {_sql_double_array(p)}) >= 0 "
        f"THEN {1 << i} ELSE 0 END"
        for i, p in enumerate(planes)
    )
    return f"""
    WITH base AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    ),
    b AS (
        SELECT vec_id, e,
               CAST(({bits}) AS BIGINT) AS bucket,
               sqrt(list_dot_product(e, e)) AS nrm
        FROM base
    ),
    q AS (SELECT e AS qv, bucket AS qb, nrm AS qn FROM b WHERE vec_id = 0),
    scored AS (
        SELECT b.vec_id, b.bucket,
               round(list_dot_product(b.e, q.qv) / (b.nrm * q.qn), 6) AS cosine
        FROM b, q
    ),
    ann AS (
        SELECT s.vec_id, s.cosine
        FROM scored s, q
        WHERE bit_count(xor(s.bucket, q.qb)) <= 2
        ORDER BY s.cosine DESC, s.vec_id ASC LIMIT 10
    ),
    exact AS (
        SELECT vec_id FROM scored ORDER BY cosine DESC, vec_id ASC LIMIT 10
    ),
    r AS (
        SELECT CAST(count(*) AS DOUBLE) / 10.0 AS recall_raw
        FROM ann JOIN exact USING (vec_id)
    )
    SELECT ann.vec_id, ann.cosine, round(r.recall_raw, 2) AS recall_at_10
    FROM ann, r
    WHERE r.recall_raw >= 0.3
    ORDER BY ann.cosine DESC, ann.vec_id ASC
"""


ALL_ORACLES["ss_ann_topk"] = _ss_ann_topk_oracle()


def _ivf_oracle_sql(
    k: int = 16,
    iters: int = 3,
    nprobe: int = 4,
    dim: int = 64,
    grid: int = 1000,
    topk: int = 10,
) -> str:
    """Unrolled d-dimensional integer-grid Lloyd's + IVF probe mirroring
    similarity.build_ivf_index_exact and the ss_ivf_topk gate (generated
    so k/iters/nprobe stay in lockstep with the Spark loop — the
    _kmeans_oracle_sql pattern lifted to array columns). Exactness rests
    on the same four legs as the Spark side: floor-of-product
    quantization, md5-ordered init, order-independent integer centroid
    sums with exact-quotient division, and index-order list folds for
    every distance (the recipe ss_brute_topk proved parity-stable)."""

    def dist(j: int, vec: str, p: str) -> str:
        return (
            f"list_sum(list_transform(range(1, {dim + 1}), "
            f"i -> (CAST({vec}[i] AS DOUBLE) - {p}.c{j}[i]) "
            f"* (CAST({vec}[i] AS DOUBLE) - {p}.c{j}[i])))"
        )

    sq = "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)"
    ctes = [
        f"""base AS MATERIALIZED (
            SELECT vec_id, embedding,
                   list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) * {grid}) AS BIGINT)) AS qv
            FROM embeddings
        )""",
        f"""init AS MATERIALIZED (
            SELECT qv, row_number() OVER (
                ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
            FROM base ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {k}
        )""",
        "p0 AS MATERIALIZED (SELECT "
        + ", ".join(
            f"max(CASE WHEN rn = {j + 1} THEN "
            f"list_transform(qv, x -> CAST(x AS DOUBLE)) END) AS c{j}"
            for j in range(k)
        )
        + " FROM init)",
    ]
    for it in range(1, iters + 2):
        # iterations 1..iters feed centroid updates; iteration iters+1 is
        # the FINAL assignment against the post-update centroids (the
        # Spark loop's trailing assign(cents))
        dists = ", ".join(f"{dist(j, 'b.qv', 'p')} AS d{j}" for j in range(k))
        least = "least(" + ", ".join(f"d{j}" for j in range(k)) + ")"
        case = (
            "CASE "
            + " ".join(f"WHEN d{j} = m THEN {j}" for j in range(k - 1))
            + f" ELSE {k - 1} END"
        )
        ctes.append(
            f"""a{it} AS MATERIALIZED (
            SELECT vec_id, qv, {case} AS cluster
            FROM (SELECT *, {least} AS m
                  FROM (SELECT b.vec_id, b.qv, {dists} FROM base b, p{it - 1} p))
        )"""
        )
        if it > iters:
            break
        ctes.append(
            f"""u{it} AS MATERIALIZED (
            SELECT cluster, g.i AS dim, sum(qv[g.i]) AS sx, count(*) AS n
            FROM a{it}, unnest(generate_series(1, {dim})) AS g(i)
            GROUP BY 1, 2
        )"""
        )
        ctes.append(
            f"p{it} AS MATERIALIZED (SELECT "
            + ", ".join(
                f"coalesce((SELECT list(CAST(sx AS DOUBLE) / n ORDER BY dim) "
                f"FROM u{it} WHERE cluster = {j}), "
                f"(SELECT c{j} FROM p{it - 1})) AS c{j}"
                for j in range(k)
            )
            + ")"
        )
    pd_union = " UNION ALL ".join(
        f"SELECT {j} AS cluster, {dist(j, 'q.qv', 'p')} AS d "
        f"FROM qrow q, p{iters} p"
        for j in range(k)
    )
    dot = (
        f"list_sum(list_transform(range(1, {dim + 1}), "
        "i -> CAST({v}[i] AS DOUBLE) * CAST(q.e[i] AS DOUBLE)))"
    )
    tail = f""",
        qrow AS MATERIALIZED (SELECT qv, embedding AS e FROM base WHERE vec_id = 0),
        pd AS ({pd_union}),
        probe AS (SELECT cluster FROM pd ORDER BY d, cluster LIMIT {nprobe}),
        cand AS (
            SELECT a.vec_id, b.embedding
            FROM a{iters + 1} a JOIN base b USING (vec_id)
            WHERE a.cluster IN (SELECT cluster FROM probe)
        ),
        ivf AS MATERIALIZED (
            SELECT vec_id,
                   round({dot.format(v='c.embedding')}
                         / (sqrt(list_sum(list_transform(c.embedding, {sq})))
                            * sqrt(list_sum(list_transform(q.e, {sq})))), 6) AS cosine
            FROM cand c, qrow q
            ORDER BY cosine DESC, vec_id LIMIT {topk}
        ),
        brute AS (
            SELECT vec_id,
                   round({dot.format(v='b.embedding')}
                         / (sqrt(list_sum(list_transform(b.embedding, {sq})))
                            * sqrt(list_sum(list_transform(q.e, {sq})))), 6) AS bcos
            FROM base b, qrow q
            ORDER BY bcos DESC, vec_id LIMIT {topk}
        ),
        rec AS (SELECT round(CAST(count(*) AS DOUBLE) / {topk}, 2) AS recall_at_10
                FROM ivf JOIN brute USING (vec_id))
        SELECT i.vec_id, i.cosine, r.recall_at_10
        FROM ivf i, rec r ORDER BY i.cosine DESC, i.vec_id"""
    return "WITH " + ",\n".join(ctes) + tail


ALL_ORACLES["ss_ivf_topk"] = _ivf_oracle_sql()


def _em_oracle_sql(iters: int = 3) -> str:
    """Unrolled EM-normal imputation mirroring impute_em_normal(rng='hash',
    tol=0.0, max_iter=iters) and the i8 gate (r12 graduation): init
    (mu, sd) from the observed data, then per iteration refill-from-
    SCRATCH (the Spark loop derives each candidate from the ORIGINAL
    frame, not the previous fill) and re-estimate, then the final fill at
    iteration index `iters`. Draws are Box-Muller over the shared md5
    60-bit uniforms — (h + 0.5)/2^60 lies in (0, 1] after double
    rounding (h within 128 of 2^60 rounds UP to u = 1.0 exactly; the
    edge is parity-safe only because Box-Muller maps it to ln(1) = 0 →
    z = 0 identically in both engines — same analysis as _hash_normal,
    operators/imputation.py; do NOT build a u<1-dependent variant like
    log1p/inverse-CDF on this recipe without re-deriving the edge) —
    keyed by (row key, iteration, tag), exactly _hash_normal.
    MATERIALIZED is load-bearing: each s{i} scalar is referenced by the
    next stage."""
    two_pi = 6.283185307179586
    grid = float(1 << 60)

    def u(tag: str, i: int) -> str:
        return (
            "((('0x' || substr(md5(k || '|" + f"{i}|{tag}" + "'), 1, 15))::BIGINT"
            f" + 0.5) / {grid!r})"
        )

    def z(i: int) -> str:
        return f"sqrt(-2.0 * ln({u('a', i)})) * cos({two_pi!r} * {u('b', i)})"

    ctes = [
        # key = plain (orderkey, linenumber): duplicates draw identical z
        # in both engines (multiset compare), and no float-rounded column
        # enters the hash key (r12 review)
        """base AS MATERIALIZED (
            SELECT l_orderkey, l_linenumber,
                   concat_ws('|', l_orderkey, l_linenumber) AS k,
                   CASE WHEN l_orderkey % 10 = 3 THEN NULL ELSE l_quantity END AS q
            FROM lineitem
        )""",
        "s0 AS MATERIALIZED (SELECT avg(q) AS mu,"
        " coalesce(stddev(q), 0.0) AS sd FROM base)",
    ]
    prev = "s0"
    for i in range(iters):
        ctes.append(
            f"""f{i} AS MATERIALIZED (
            SELECT coalesce(q, s.mu + s.sd * ({z(i)})) AS fq
            FROM base, {prev} s
        )"""
        )
        ctes.append(
            f"s{i + 1} AS MATERIALIZED (SELECT avg(fq) AS mu,"
            f" coalesce(stddev(fq), 0.0) AS sd FROM f{i})"
        )
        prev = f"s{i + 1}"
    # floor to the integer centi-grid, never round(x, 6): the fills end an
    # iterative float trajectory and agree only to ~1e-12 across engines —
    # floor at 1e-2 spacing flips with probability ~1e-10 per row and is
    # the same function in both engines (r12 review)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
        SELECT l_orderkey, l_linenumber,
               CAST(floor(coalesce(q, s.mu + s.sd * ({z(iters)})) * 100) AS BIGINT)
                   AS filled_q_c
        FROM base, {prev} s
        ORDER BY l_orderkey, l_linenumber, filled_q_c"""
    )


ALL_ORACLES["i8_impute_em"] = _em_oracle_sql()




# M5 cross-validation graduated (r11): md5-hash folds (t8_hash_split's
# proven engine-portable bucket recipe), closed-form OLS per fold
# (m10/m12's covar_pop algebra; scaler-invariant predictions), standard
# R2 = 1 - SSres/SStot on the held-out fold with SStot from the stable
# var_pop (never sum(y^2) - n*mean^2, which cancels catastrophically).
ALL_ORACLES["m5_cross_val"] = """
    WITH li AS (
        SELECT CAST(l_quantity AS DOUBLE) AS x1,
               CAST(l_discount AS DOUBLE) AS x2,
               CAST(l_extendedprice AS DOUBLE) AS y,
               (CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || ','
                      || CAST(l_linenumber AS VARCHAR)), 1, 8)) AS BIGINT) % 3) AS fold
        FROM lineitem
    ),
    folds AS (SELECT unnest([0, 1, 2]) AS k),
    st AS (
        SELECT f.k,
               avg(x1) AS m1, avg(x2) AS m2, avg(y) AS my,
               var_pop(x1) AS v11, var_pop(x2) AS v22,
               covar_pop(x1, x2) AS v12,
               covar_pop(x1, y) AS c1, covar_pop(x2, y) AS c2
        FROM li, folds f WHERE li.fold <> f.k GROUP BY f.k
    ),
    b AS (
        SELECT k, my, m1, m2,
               (c1 * v22 - c2 * v12) / (v11 * v22 - v12 * v12) AS b1,
               (c2 * v11 - c1 * v12) / (v11 * v22 - v12 * v12) AS b2
        FROM st
    ),
    scored AS (
        SELECT b.k, li.y,
               b.my + b.b1 * (li.x1 - b.m1) + b.b2 * (li.x2 - b.m2) AS pred
        FROM li JOIN b ON li.fold = b.k
    ),
    per_fold AS (
        SELECT k,
               1.0 - sum((y - pred) * (y - pred))
                     / (var_pop(y) * count(*)) AS r2
        FROM scored GROUP BY k
    )
    SELECT 'fold_' || CAST(k AS VARCHAR) AS k, round(r2, 6) AS r2 FROM per_fold
    UNION ALL
    SELECT 'mean', round(avg(r2), 6) FROM per_fold
"""


# M4 graduated (r11): |standardized OLS coefficient| importances —
# b_std_j = b_raw_j * sd_samp_j; b_raw from the covar_pop symbolic
# 2-feature inverse (the n/(n-1) scaling cancels in the solve), sd_samp
# matching MLlib StandardScaler's sample std. Sorted by importance DESC
# the way feature_importances() sorts.
ALL_ORACLES["m4_feature_importances"] = """
    WITH st AS (
        SELECT var_pop(l_quantity) AS v11, var_pop(l_discount) AS v22,
               covar_pop(l_quantity, l_discount) AS v12,
               covar_pop(l_quantity, l_extendedprice) AS c1,
               covar_pop(l_discount, l_extendedprice) AS c2,
               stddev_samp(CAST(l_quantity AS DOUBLE)) AS sd1,
               stddev_samp(CAST(l_discount AS DOUBLE)) AS sd2
        FROM lineitem
    ), b AS (
        SELECT abs((c1 * v22 - c2 * v12) / (v11 * v22 - v12 * v12)) * sd1 AS i1,
               abs((c2 * v11 - c1 * v12) / (v11 * v22 - v12 * v12)) * sd2 AS i2
        FROM st
    ), rows_ AS (
        SELECT 'l_quantity' AS feature, round(i1, 6) AS importance, i1 AS raw FROM b
        UNION ALL
        SELECT 'l_discount', round(i2, 6), i2 FROM b
    )
    SELECT feature, importance FROM rows_ ORDER BY raw DESC
"""


# M3 graduated (r11): the metric suite over the deterministic
# nearest-anchor scorer — confusion-matrix metrics from exact counts in
# ascending-class order (mirroring evaluate_classification's driver
# loop), and the binned Mann-Whitney OVR-AUC replayed line for line:
# per-class min/max, 10k-bin histogram, exclusive-prefix mid-ranks,
# tie-adjusted rank-sum statistic, support weighting.
ALL_ORACLES["m3_eval_classification"] = """
    WITH base AS (
        SELECT CASE o_orderstatus WHEN 'F' THEN 0.0 WHEN 'O' THEN 1.0
                    ELSE 2.0 END AS y,
               -abs(CAST(o_totalprice AS DOUBLE) - 50000.0) AS s0,
               -abs(CAST(o_totalprice AS DOUBLE) - 150000.0) AS s1,
               -abs(CAST(o_totalprice AS DOUBLE) - 300000.0) AS s2
        FROM orders
    ),
    scored AS (
        SELECT y, s0, s1, s2,
               CASE WHEN s0 >= s1 AND s0 >= s2 THEN 0.0
                    WHEN s1 >= s2 THEN 1.0 ELSE 2.0 END AS pred
        FROM base
    ),
    per_cls AS (
        SELECT c.cls,
               (SELECT count(*) FROM scored WHERE y = c.cls) AS support,
               (SELECT count(*) FROM scored WHERE pred = c.cls) AS predicted,
               (SELECT count(*) FROM scored WHERE y = c.cls AND pred = c.cls) AS tp
        FROM (SELECT unnest([0.0, 1.0, 2.0]) AS cls) c
    ),
    prf AS (
        SELECT cls, support,
               CASE WHEN predicted > 0 THEN CAST(tp AS DOUBLE) / predicted
                    ELSE 0.0 END AS prec,
               CAST(tp AS DOUBLE) / support AS rec, tp
        FROM per_cls
    ),
    cm AS (
        SELECT (SELECT sum(tp) FROM prf) * 1.0
                 / (SELECT count(*) FROM scored) AS accuracy,
               sum(support * prec) / (SELECT count(*) FROM scored) AS precision_,
               sum(support * rec) / (SELECT count(*) FROM scored) AS recall_,
               sum(support * CASE WHEN prec + rec > 0.0
                     THEN 2.0 * prec * rec / (prec + rec) ELSE 0.0 END)
                 / (SELECT count(*) FROM scored) AS f1_
        FROM prf
    ),
    pairs AS (
        SELECT c.cls,
               CASE c.cls WHEN 0.0 THEN s.s0 WHEN 1.0 THEN s.s1
                    ELSE s.s2 END AS score,
               CASE WHEN s.y = c.cls THEN 1.0 ELSE 0.0 END AS pos
        FROM scored s, (SELECT unnest([0.0, 1.0, 2.0]) AS cls) c
    ),
    rng AS (SELECT cls, min(score) AS lo, max(score) AS hi FROM pairs GROUP BY cls),
    binned AS (
        SELECT p.cls,
               least(CAST(floor((p.score - r.lo)
                     / (CASE WHEN r.hi > r.lo THEN (r.hi - r.lo) / 10000.0
                             ELSE 1.0 END)) AS BIGINT),
                     CAST(9999 AS BIGINT)) AS bin,
               count(*) AS n, sum(p.pos) AS np
        FROM pairs p JOIN rng r USING (cls) GROUP BY 1, 2
    ),
    mids AS (
        SELECT cls, np,
               coalesce(sum(n) OVER (PARTITION BY cls ORDER BY bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 + (n + 1) / 2.0 AS midrank, n
        FROM binned
    ),
    stats AS (
        SELECT cls, sum(np * midrank) AS rpos, sum(np) AS n_pos,
               sum(n) AS n_all
        FROM mids GROUP BY cls
    ),
    auc AS (
        SELECT sum(
            (CASE WHEN n_pos > 0 AND n_all - n_pos > 0
                  THEN (rpos - n_pos * (n_pos + 1) / 2.0)
                       / (n_pos * (n_all - n_pos))
                  ELSE 0.5 END) * (n_pos / n_all)) AS roc_auc
        FROM stats
    )
    SELECT 'accuracy' AS metric, round(accuracy, 6) AS value FROM cm
    UNION ALL SELECT 'f1', round(f1_, 6) FROM cm
    UNION ALL SELECT 'precision', round(precision_, 6) FROM cm
    UNION ALL SELECT 'recall', round(recall_, 6) FROM cm
    UNION ALL SELECT 'roc_auc', round(roc_auc, 6) FROM auc
"""
