"""Round-3 nineteenth tranche: multimodal MIME sniffing (magic bytes over
binary payloads), information-gain token selection, grid-density
clustering (DBSCAN-style core cells + label-propagation components),
monthly VWAP/TWAP price aggregates, and PSI drift detection between
table snapshots.

Catalog contract as everywhere: (Spark program, DuckDB oracle) pairs with
identical semantics; logs rounded at 9 dp pre-sum, means as exact-integer
ratios, total-order tie-breaks on every argmax/first."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import register, _t
from .datapipe import text as tx
from .functions import dsum


# --------------------------------------------------------------------------
# Multimodal MIME sniffing — magic-number detection on a binary column.
# The testdata carries no real media, so each doc gets a deterministic
# payload: a magic header chosen by doc_id % 5 prepended to the UTF-8
# text (the dedup_url_canonical fixture precedent: both engines build the
# identical bytes, then exercise the identical sniffer).
# --------------------------------------------------------------------------

_MAGICS = [  # (selector, hex header, mime)
    (0, "89504E470D0A1A0A", "image/png"),
    (1, "FFD8FFE0", "image/jpeg"),
    (2, "52494646AAAAAAAA57415645", "audio/wav"),  # RIFF....WAVE
    (3, "474946383961", "image/gif"),
]


def _sql_mime_sniff() -> str:
    hdr = "CASE " + " ".join(
        f"WHEN doc_id % 5 = {s} THEN unhex('{h}')" for s, h, _ in _MAGICS
    ) + " ELSE unhex('') END"
    sniff = (
        "CASE WHEN starts_with(hx, '89504E470D0A1A0A') THEN 'image/png' "
        "WHEN starts_with(hx, 'FFD8FF') THEN 'image/jpeg' "
        "WHEN starts_with(hx, '52494646') AND substr(hx, 17, 8) = '57415645' THEN 'audio/wav' "
        "WHEN starts_with(hx, '474946383961') THEN 'image/gif' "
        "ELSE 'application/octet-stream' END"
    )
    return f"""
WITH payloads AS (
  SELECT doc_id, ({hdr} || encode(text)) AS payload FROM documents
),
sniffed AS (
  SELECT doc_id,
         upper(left(hex(payload), 24)) AS hx,
         CAST(octet_length(payload) AS BIGINT) AS n_bytes
  FROM payloads
)
SELECT doc_id, {sniff} AS mime, n_bytes
FROM sniffed ORDER BY doc_id
"""


@register(
    "multimodal_mime_sniff",
    oracle=_sql_mime_sniff(),
    tags=("multimodal", "binary", "dq"),
)
def multimodal_mime_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-type sniffing over an opaque binary column: compare the
    payload's leading bytes against the PNG/JPEG/RIFF-WAVE/GIF magic
    numbers — what an ingest gate runs before routing media to decoders
    (datapipe.multimodal). The Spark side slices the FIRST 12 bytes
    before hexing (the scale-correct order: never hex a whole video);
    the oracle hexes then trims — same value, small fixtures. Row-local
    expressions only; at 100 TB this is a map-only pass."""
    docs = _t(spark, sf_dir, "documents")
    hdr = F.when(F.lit(False), F.unhex(F.lit("")))
    for s, h, _ in _MAGICS:
        hdr = hdr.when(F.col("doc_id") % 5 == s, F.unhex(F.lit(h)))
    payload = F.concat(
        hdr.otherwise(F.unhex(F.lit(""))), F.encode(F.col("text"), "UTF-8")
    )
    p = docs.select(
        "doc_id",
        F.upper(F.hex(F.substring(payload, 1, 12))).alias("hx"),
        F.length(payload).cast("bigint").alias("n_bytes"),
    )
    mime = (
        F.when(F.col("hx").startswith("89504E470D0A1A0A"), "image/png")
        .when(F.col("hx").startswith("FFD8FF"), "image/jpeg")
        .when(
            F.col("hx").startswith("52494646")
            & (F.substring("hx", 17, 8) == "57415645"),
            "audio/wav",
        )
        .when(F.col("hx").startswith("474946383961"), "image/gif")
        .otherwise("application/octet-stream")
    )
    return p.select("doc_id", mime.alias("mime"), "n_bytes").orderBy("doc_id")


# --------------------------------------------------------------------------
# Information-gain token selection (entropy-based feature ranking)
# --------------------------------------------------------------------------

_IG_TOPK = 20

_PLOGP = "CASE WHEN {p} > 0 THEN round(({p}) * ln({p}), 9) ELSE 0.0 END"


def _sql_info_gain() -> str:
    toks = tx.sql_tokens("text")
    h = _PLOGP.format(p="d / CAST(n AS DOUBLE)")
    hp = _PLOGP.format(p="n1 / CAST(n1_tot AS DOUBLE)")
    ha = _PLOGP.format(p="(d - n1) / CAST(n - n1_tot AS DOUBLE)")
    q = "CAST(SUM(CAST(round(({t}) * 1000000.0) AS HUGEINT)) AS DOUBLE) / 1000000.0"
    return f"""
WITH pres AS (
  SELECT DISTINCT doc_id, lang, unnest({toks}) AS tok FROM documents
),
lang_tot AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS d FROM documents GROUP BY lang
),
ntot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
h_lang AS (
  SELECT -({q.format(t=h)}) AS h0 FROM lang_tot CROSS JOIN ntot
),
grid AS (
  SELECT t.tok, l.lang, l.d, COALESCE(c.n1, 0) AS n1
  FROM (SELECT DISTINCT tok FROM pres) t
  CROSS JOIN lang_tot l
  LEFT JOIN (
    SELECT tok, lang, CAST(count(*) AS BIGINT) AS n1 FROM pres GROUP BY tok, lang
  ) c ON c.tok = t.tok AND c.lang = l.lang
),
pertok AS (
  SELECT tok, CAST(sum(n1) AS BIGINT) AS n1_tot FROM grid GROUP BY tok
),
terms AS (
  SELECT g.tok, p.n1_tot, ntot.n,
         {hp} AS tp,
         {ha} AS ta
  FROM grid g JOIN pertok p USING (tok) CROSS JOIN ntot
),
ent AS (
  SELECT tok, min(n1_tot) AS df,
         -({q.format(t="tp")}) AS h_pres,
         -({q.format(t="ta")}) AS h_abs,
         min(n1_tot) / CAST(min(n) AS DOUBLE) AS w_pres
  FROM terms GROUP BY tok
)
SELECT tok, df,
       round(h0 - w_pres * h_pres - (1.0 - w_pres) * h_abs, 9) AS info_gain
FROM ent CROSS JOIN h_lang
ORDER BY info_gain DESC, tok LIMIT {_IG_TOPK}
"""


@register(
    "text_info_gain",
    oracle=_sql_info_gain(),
    tags=("text", "ml", "features"),
)
def text_info_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Information gain of each token for predicting the document
    language: IG(t) = H(lang) − P(t)·H(lang|t present) − P(¬t)·H(lang|t
    absent) — the entropy-based feature selector (decision-stump split
    criterion). Presence counts are one distinct + one groupBy; the
    vocab × lang grid rides in as a broadcast dim; every p·ln p term is
    rounded at 9 dp and micro-quantize-summed. At 100 TB the only
    corpus-sized shuffle is the distinct over (doc, lang, token) ints."""
    docs = _t(spark, sf_dir, "documents")
    pres = docs.select(
        "doc_id", "lang", F.explode(F.array_distinct(tx.tokens("text"))).alias("tok")
    )
    lang_tot = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("d"))
    ntot = docs.agg(F.count(F.lit(1)).alias("n"))

    def plogp(p):
        return F.when(p > 0, F.round(p * F.log(p), 9)).otherwise(F.lit(0.0))

    h_lang = (
        lang_tot.crossJoin(F.broadcast(ntot))
        .agg((-dsum(plogp(F.col("d") / F.col("n").cast("double")))).alias("h0"))
    )
    c = pres.groupBy("tok", "lang").agg(F.count(F.lit(1)).alias("n1"))
    vocab = pres.select("tok").distinct()
    grid = (
        vocab.crossJoin(F.broadcast(lang_tot))
        .join(
            F.broadcast(
                c.select(F.col("tok").alias("c_tok"), F.col("lang").alias("c_lang"), "n1")
            ),
            (F.col("c_tok") == F.col("tok")) & (F.col("c_lang") == F.col("lang")),
            "left",
        )
        .select("tok", "lang", "d", F.coalesce("n1", F.lit(0)).alias("n1"))
    )
    wt = Window.partitionBy("tok")
    terms = grid.crossJoin(F.broadcast(ntot)).select(
        "tok",
        "n",
        F.sum("n1").over(wt).alias("n1_tot"),
        plogp(F.col("n1") / F.sum("n1").over(wt).cast("double")).alias("tp"),
        plogp(
            (F.col("d") - F.col("n1"))
            / (F.col("n") - F.sum("n1").over(wt)).cast("double")
        ).alias("ta"),
    )
    ent = terms.groupBy("tok").agg(
        F.min("n1_tot").alias("df"),
        (-dsum(F.col("tp"))).alias("h_pres"),
        (-dsum(F.col("ta"))).alias("h_abs"),
        (F.min("n1_tot") / F.min("n").cast("double")).alias("w_pres"),
    )
    return (
        ent.crossJoin(F.broadcast(h_lang))
        .select(
            "tok",
            "df",
            F.round(
                F.col("h0")
                - F.col("w_pres") * F.col("h_pres")
                - (1.0 - F.col("w_pres")) * F.col("h_abs"),
                9,
            ).alias("info_gain"),
        )
        .orderBy(F.desc("info_gain"), "tok")
        .limit(_IG_TOPK)
    )


# --------------------------------------------------------------------------
# Grid-density clustering (DBSCAN-style: dense cells + connected components)
# --------------------------------------------------------------------------

_GRID_EPS_MICRO = 40_000  # 0.04 in micro-units
_GRID_MINPTS = 3
_GRID_CC_ROUNDS = 20  # >= measured cell-graph diameter (16 at sf0.1) + margin


def _sql_grid_density() -> str:
    cell = (
        "CAST(floor(CAST(round(CAST(embedding[{i}] AS DOUBLE) * 1000000.0) AS BIGINT)"
        f" / CAST({_GRID_EPS_MICRO} AS DOUBLE)) AS BIGINT)"
    )
    # AS MATERIALIZED: without it DuckDB inlines each single-reference
    # CTE, nesting the whole chain into one expression whose shared
    # prefixes re-evaluate per round — measured 505s vs ~2s materialized
    # (the SQL mirror of the Spark side's localCheckpoint discipline).
    labs = ["lab0"]
    prop = []
    for r in range(1, _GRID_CC_ROUNDS + 1):
        prop.append(
            f"lab{r} AS MATERIALIZED (SELECT n.src AS cid, min(l.lab) AS lab "
            f"FROM nbr n JOIN lab{r-1} l ON l.cid = n.dst GROUP BY n.src)"
        )
        labs.append(f"lab{r}")
    return f"""
WITH pts AS (
  SELECT vec_id, {cell.format(i=1)} AS cx, {cell.format(i=2)} AS cy
  FROM embeddings
),
dense AS (
  SELECT cx, cy, CAST(count(*) AS BIGINT) AS npts
  FROM pts GROUP BY cx, cy HAVING count(*) >= {_GRID_MINPTS}
),
ids AS MATERIALIZED (
  SELECT cx, cy, npts, row_number() OVER (ORDER BY cx, cy) AS cid FROM dense
),
offs AS (
  SELECT dx, dy FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1)) o(dx, dy)
),
nbr AS MATERIALIZED (
  SELECT a.cid AS src, b.cid AS dst
  FROM ids a CROSS JOIN offs
  JOIN ids b ON b.cx = a.cx + offs.dx AND b.cy = a.cy + offs.dy
),
lab0 AS (SELECT cid, cid AS lab FROM ids),
{", ".join(prop)},
clusters AS (
  SELECT l.lab AS cluster_id, CAST(count(*) AS BIGINT) AS n_cells,
         CAST(sum(i.npts) AS BIGINT) AS n_pts
  FROM lab{_GRID_CC_ROUNDS} l JOIN ids i USING (cid) GROUP BY l.lab
),
noise AS (
  SELECT CAST(-1 AS BIGINT) AS cluster_id, CAST(0 AS BIGINT) AS n_cells,
         (SELECT CAST(count(*) AS BIGINT) FROM pts)
           - (SELECT CAST(COALESCE(sum(n_pts), 0) AS BIGINT) FROM clusters) AS n_pts
)
SELECT * FROM clusters UNION ALL SELECT * FROM noise ORDER BY cluster_id
"""


@register(
    "cluster_grid_density",
    oracle=_sql_grid_density(),
    tags=("cluster", "embeddings", "ml"),
)
def cluster_grid_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN-style density clustering on the embedding's first two
    dimensions: quantize to an eps-grid (exact integer cell indices from
    micro-quantized coordinates), keep cells with >= minPts points
    (core cells), connect 8-neighbor core cells, and label components by
    iterated min-label propagation — {_GRID_CC_ROUNDS} unrolled rounds
    over the CELL graph, whose size is bounded by the grid (never the
    corpus; the large-star/small-star alternative for general graphs is
    datapipe.clustering). Neighbor candidates come from an EQUI-join on
    shifted cell coordinates (offset explode), not an inequality join.
    Output: one row per cluster (+ the noise row, cluster_id = -1)."""
    emb = _t(spark, sf_dir, "embeddings")

    def cell(i: int) -> F.Column:
        micro = F.round(F.col("embedding").getItem(i).cast("double") * 1000000.0).cast(
            "long"
        )
        return F.floor(micro / F.lit(float(_GRID_EPS_MICRO))).cast("bigint")

    pts = emb.select("vec_id", cell(0).alias("cx"), cell(1).alias("cy"))
    dense = (
        pts.groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).alias("npts"))
        .filter(F.col("npts") >= _GRID_MINPTS)
    )
    ids = dense.select(
        "cx", "cy", "npts", F.row_number().over(Window.orderBy("cx", "cy")).alias("cid")
    )
    offs = spark.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)], "dx long, dy long"
    )
    shifted = ids.crossJoin(F.broadcast(offs)).select(
        F.col("cid").alias("src"),
        (F.col("cx") + F.col("dx")).alias("nx"),
        (F.col("cy") + F.col("dy")).alias("ny"),
    )
    # The iterative loop follows datapipe.clustering's discipline:
    # localCheckpoint(eager) truncates lineage each round, so round r is
    # ONE tiny broadcast join over materialized cells — without it,
    # Catalyst replans (and recomputes) the full r-deep join chain every
    # round, which measured 500+s for 20 rounds vs ~10s checkpointed.
    nbr = (
        shifted.join(
            F.broadcast(ids.select(F.col("cid").alias("dst"), F.col("cx").alias("nx"), F.col("cy").alias("ny"))),
            ["nx", "ny"],
        )
        .select("src", "dst")
        .localCheckpoint(eager=True)
    )
    labels = ids.select("cid", F.col("cid").alias("lab")).localCheckpoint(eager=True)
    for _ in range(_GRID_CC_ROUNDS):
        labels = (
            nbr.join(F.broadcast(labels.select(F.col("cid").alias("dst"), "lab")), "dst")
            .groupBy("src")
            .agg(F.min("lab").alias("lab"))
            .select(F.col("src").alias("cid"), "lab")
            .localCheckpoint(eager=True)
        )
    clusters = (
        labels.join(F.broadcast(ids.select("cid", "npts")), "cid")
        .groupBy("lab")
        .agg(F.count(F.lit(1)).alias("n_cells"), F.sum("npts").alias("n_pts"))
        .select(F.col("lab").alias("cluster_id"), "n_cells", "n_pts")
    )
    total = pts.agg(F.count(F.lit(1)).alias("total"))
    clustered = clusters.agg(F.coalesce(F.sum("n_pts"), F.lit(0)).alias("inc"))
    noise = (
        total.crossJoin(F.broadcast(clustered))
        .select(
            F.lit(-1).cast("bigint").alias("cluster_id"),
            F.lit(0).cast("bigint").alias("n_cells"),
            (F.col("total") - F.col("inc")).alias("n_pts"),
        )
    )
    return clusters.unionByName(noise).orderBy("cluster_id")


# --------------------------------------------------------------------------
# Monthly VWAP / TWAP (finance-standard price aggregates)
# --------------------------------------------------------------------------

_VWAP_MAX_PART = 100

_SQL_VWAP = f"""
WITH li AS (
  SELECT l_partkey, CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
         l_extendedprice AS price, l_quantity AS qty,
         CAST(l_shipdate AS VARCHAR) || lpad(CAST(l_orderkey AS VARCHAR), 12, '0')
           || lpad(CAST(l_linenumber AS VARCHAR), 2, '0') AS seq
  FROM lineitem WHERE l_partkey <= {_VWAP_MAX_PART}
)
SELECT l_partkey, month,
       CAST(count(*) AS BIGINT) AS n_trades,
       round(CAST(SUM(CAST(round(price * qty * 1000000.0) AS HUGEINT)) AS DOUBLE)
               / CAST(SUM(CAST(round(qty * 1000000.0) AS HUGEINT)) AS DOUBLE), 9) AS vwap,
       round(CAST(SUM(CAST(round(price * 1000000.0) AS HUGEINT)) AS DOUBLE)
               / count(*) / 1000000.0, 9) AS twap,
       arg_min(price, seq) AS open,
       arg_max(price, seq) AS close,
       min(price) AS low, max(price) AS high
FROM li GROUP BY l_partkey, month
ORDER BY l_partkey, month
"""


@register(
    "finance_vwap_monthly",
    oracle=_SQL_VWAP,
    tags=("finance", "agg", "window"),
)
def finance_vwap_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly VWAP/TWAP + OHLC per part over lineitem "trades": the
    finance-standard bar aggregation. VWAP is a ratio of two exact
    micro-quantized integer sums (Σ price·qty / Σ qty); open/close pick
    the first/last trade by a portable composite sequence key (shipdate
    string + zero-padded order/line ids — a total order, so min_by/
    arg_min agree across engines). One partial-aggregable groupBy; the
    part filter pushes to the parquet scan."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_partkey") <= _VWAP_MAX_PART)
    seq = F.concat(
        F.col("l_shipdate").cast("string"),
        F.lpad(F.col("l_orderkey").cast("string"), 12, "0"),
        F.lpad(F.col("l_linenumber").cast("string"), 2, "0"),
    )
    base = li.select(
        "l_partkey",
        F.trunc("l_shipdate", "month").alias("month"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_quantity").alias("qty"),
        seq.alias("seq"),
    )
    pq = F.sum(F.round(F.col("price") * F.col("qty") * 1000000.0).cast("long"))
    qs = F.sum(F.round(F.col("qty") * 1000000.0).cast("long"))
    ps = F.sum(F.round(F.col("price") * 1000000.0).cast("long"))
    return (
        base.groupBy("l_partkey", "month")
        .agg(
            F.count(F.lit(1)).alias("n_trades"),
            F.round(pq.cast("double") / qs.cast("double"), 9).alias("vwap"),
            F.round(ps.cast("double") / F.count(F.lit(1)) / 1000000.0, 9).alias("twap"),
            F.min_by("price", "seq").alias("open"),
            F.max_by("price", "seq").alias("close"),
            F.min("price").alias("low"),
            F.max("price").alias("high"),
        )
        .orderBy("l_partkey", "month")
    )


# --------------------------------------------------------------------------
# PSI drift detection between snapshots (numeric deciles + categorical)
# --------------------------------------------------------------------------

_PSI_PIVOT = "1998-07-01"


def _sql_psi() -> str:
    return f"""
WITH a AS (SELECT * FROM orders WHERE o_orderdate < DATE '{_PSI_PIVOT}'),
b AS (SELECT * FROM orders WHERE o_orderdate >= DATE '{_PSI_PIVOT}'),
edges AS (
  SELECT quantile_cont(o_totalprice, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS e FROM a
),
num_a AS (
  SELECT 'o_totalprice' AS feature,
         'd' || lpad(CAST(1 + len(list_filter(e, x -> o_totalprice > x)) AS VARCHAR), 2, '0') AS bucket,
         CAST(count(*) AS BIGINT) AS cnt_a
  FROM a CROSS JOIN edges GROUP BY 2
),
num_b AS (
  SELECT 'd' || lpad(CAST(1 + len(list_filter(e, x -> o_totalprice > x)) AS VARCHAR), 2, '0') AS bucket,
         CAST(count(*) AS BIGINT) AS cnt_b
  FROM b CROSS JOIN edges GROUP BY 1
),
cat_a AS (
  SELECT 'o_orderpriority' AS feature, o_orderpriority AS bucket,
         CAST(count(*) AS BIGINT) AS cnt_a
  FROM a GROUP BY 2
),
cat_b AS (
  SELECT o_orderpriority AS bucket, CAST(count(*) AS BIGINT) AS cnt_b
  FROM b GROUP BY 1
),
joined AS (
  SELECT feature, bucket, cnt_a, COALESCE(num_b.cnt_b, 0) AS cnt_b
  FROM num_a LEFT JOIN num_b USING (bucket)
  UNION ALL
  SELECT feature, bucket, cnt_a, COALESCE(cat_b.cnt_b, 0) AS cnt_b
  FROM cat_a LEFT JOIN cat_b USING (bucket)
),
shares AS (
  SELECT feature, bucket, cnt_a, cnt_b,
         (cnt_a + 1) / CAST(sum(cnt_a) OVER (PARTITION BY feature)
                              + count(*) OVER (PARTITION BY feature) AS DOUBLE) AS pa,
         (cnt_b + 1) / CAST(sum(cnt_b) OVER (PARTITION BY feature)
                              + count(*) OVER (PARTITION BY feature) AS DOUBLE) AS pb
  FROM joined
),
terms AS (
  SELECT feature, bucket, cnt_a, cnt_b,
         round(pa, 9) AS share_a, round(pb, 9) AS share_b,
         round((pb - pa) * round(ln(pb / pa), 9), 9) AS psi_term
  FROM shares
)
SELECT feature, bucket, cnt_a, cnt_b, share_a, share_b, psi_term,
       (CAST(SUM(CAST(round(psi_term * 1000000.0) AS HUGEINT))
               OVER (PARTITION BY feature) AS DOUBLE) / 1000000.0) AS psi
FROM terms ORDER BY feature, bucket
"""


@register(
    "dq_psi_drift",
    oracle=_sql_psi(),
    tags=("dq", "drift", "stats"),
)
def dq_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two order snapshots (before /
    after {_PSI_PIVOT}) — the model-monitoring standard for feature
    drift. Numeric features bucket by the BASELINE snapshot's exact
    deciles (edge array broadcast, bucket = 1 + count(edges < v) via a
    row-local array filter); categoricals bucket by value. Add-1
    smoothing keeps empty buckets finite (the smoothed-PSI convention);
    per-feature PSI is a constant-state window over the bucket rows.
    Two scans + two small aggs; buckets never exceed deciles+categories."""
    orders = _t(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderdate") < F.lit(_PSI_PIVOT).cast("date"))
    b = orders.filter(F.col("o_orderdate") >= F.lit(_PSI_PIVOT).cast("date"))
    edges = a.agg(
        F.percentile(
            "o_totalprice", F.lit([i / 10.0 for i in range(1, 10)])
        ).alias("e")
    )

    def num_bucket(df):
        return df.crossJoin(F.broadcast(edges)).select(
            F.concat(
                F.lit("d"),
                F.lpad(
                    (
                        1
                        + F.size(
                            F.filter(F.col("e"), lambda x: F.col("o_totalprice") > x)
                        )
                    ).cast("string"),
                    2,
                    "0",
                ),
            ).alias("bucket")
        )

    num_a = num_bucket(a).groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt_a"))
    num_b = num_bucket(b).groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt_b"))
    cat_a = a.groupBy(F.col("o_orderpriority").alias("bucket")).agg(
        F.count(F.lit(1)).alias("cnt_a")
    )
    cat_b = b.groupBy(F.col("o_orderpriority").alias("bucket")).agg(
        F.count(F.lit(1)).alias("cnt_b")
    )
    joined = (
        num_a.join(num_b, "bucket", "left")
        .select(
            F.lit("o_totalprice").alias("feature"),
            "bucket",
            "cnt_a",
            F.coalesce("cnt_b", F.lit(0)).alias("cnt_b"),
        )
        .unionByName(
            cat_a.join(cat_b, "bucket", "left").select(
                F.lit("o_orderpriority").alias("feature"),
                "bucket",
                "cnt_a",
                F.coalesce("cnt_b", F.lit(0)).alias("cnt_b"),
            )
        )
    )
    wf = Window.partitionBy("feature")
    pa = (F.col("cnt_a") + 1) / (
        F.sum("cnt_a").over(wf) + F.count(F.lit(1)).over(wf)
    ).cast("double")
    pb = (F.col("cnt_b") + 1) / (
        F.sum("cnt_b").over(wf) + F.count(F.lit(1)).over(wf)
    ).cast("double")
    terms = joined.select(
        "feature",
        "bucket",
        "cnt_a",
        "cnt_b",
        F.round(pa, 9).alias("share_a"),
        F.round(pb, 9).alias("share_b"),
        F.round((pb - pa) * F.round(F.log(pb / pa), 9), 9).alias("psi_term"),
    )
    return terms.withColumn(
        "psi",
        F.sum(F.round(F.col("psi_term") * 1000000.0).cast("long")).over(wf).cast(
            "double"
        )
        / 1000000.0,
    ).orderBy("feature", "bucket")
