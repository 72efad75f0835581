"""[EXT] Distributed ML primitives over the embeddings table: exact,
oracle-checked k-means (single iteration and a multi-round fit).

k-means is the workhorse behind IVF coarse quantizers (see
operators/similarity.ivf_topk, which uses stride-seeded centroids and
would take these refined centroids as a drop-in), embedding-space corpus
clustering, and diversity sampling in training-data curation. Spark's
MLlib KMeans is RNG-seeded and float-sum nondeterministic; this is the
DataFrame-native algorithm expressed so every double is reproducible in
ANSI SQL:

- init: stride-seeded centroids (every |corpus|/k-th vector by id — the
  same training-free seeding as ivf_topk, so the two share a contract);
- assign: nearest centroid by cosine (dim-sequential fold), computed
  IN-ROW against k LITERAL centroid vectors — the argmax is
  ``array_position(sims, array_max(sims))``, first-match = lowest centroid
  index on ties, so assignment is a pure scan-side projection: ZERO
  shuffles, no row blowup, corpus x k folds distributed over the scan;
- update: new centroid = per-cell mean of member vectors on FIXED-POINT
  components (floor(x * 2^20) -> BIGINT): integer sums are associative, so
  the mean is identical under any partitioning/parallelism on any engine —
  the float-sum nondeterminism that usually makes distributed k-means
  unreproducible is engineered out. Precision cost: 2^-20 per component,
  below the 2^-24-per-ULP float32 input noise floor. The only exchange per
  round is the (cell, dim)-keyed aggregation, which map-side combines to
  k x dim rows per task;
- iterate: the round's k x dim output collects to the driver (KBs) and
  feeds the next round's literal centroids — the same driver-coordinated
  fixpoint shape as operators/components.connected_components, with the
  oracle chaining the identical rounds as CTEs.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity as S
from ..registry import register
from ._util import t

K_LISTS = 8
DIM = S.EMBED_DIM  # single source for the geometry contract (r9)
Q_SCALE = 1 << 20  # fixed-point scale for the centroid-update sums

_SEED_CTES = f"""
good AS (
    -- NULL / wrong-dimension vectors are excluded from the fit on BOTH
    -- engines (review r7): the engine's posexplode emits nothing for a
    -- NULL vector while this oracle's CROSS JOIN range emitted {DIM}
    -- NULL-q rows for it, inflating COUNT(*) in the mean's denominator
    SELECT vec_id, embedding FROM embeddings
    WHERE embedding IS NOT NULL AND len(embedding) = {DIM}
),
ids AS (
    SELECT vec_id AS id, row_number() OVER (ORDER BY vec_id) - 1 AS rn
    FROM good
),
params AS (SELECT greatest(1, COUNT(*) // {K_LISTS}) AS stride FROM ids),
cents1 AS (
    SELECT CAST(i.rn // p.stride AS INTEGER) AS cidx, e.embedding AS cv
    FROM ids i CROSS JOIN params p
    JOIN good e ON e.vec_id = i.id
    WHERE i.rn % p.stride = 0 AND i.rn // p.stride < {K_LISTS}
),
vecs AS (SELECT vec_id AS id, embedding AS vec FROM good)"""


def _round_ctes(r: int) -> str:
    """One assign+update round as chained CTEs reading cents{r} -> upd{r}."""
    return f"""
sims{r} AS (
    SELECT v.id, c.cidx,
           {S._dot_sql("v.vec", "c.cv")}
           / (sqrt({S._dot_sql("v.vec", "v.vec")})
              * sqrt({S._dot_sql("c.cv", "c.cv")})) AS sim
    FROM vecs v CROSS JOIN cents{r} c
),
cells{r} AS (
    SELECT id, cidx AS cell FROM (
        SELECT id, cidx,
               row_number() OVER (PARTITION BY id ORDER BY sim DESC, cidx ASC)
                   AS rnk
        FROM sims{r}) WHERE rnk = 1
),
comp{r} AS (
    SELECT ce.cell, CAST(d.dim AS INTEGER) AS dim,
           CAST(floor(CAST(v.vec[CAST(d.dim AS INTEGER) + 1] AS DOUBLE)
                      * {Q_SCALE}.0) AS BIGINT) AS q
    FROM cells{r} ce
    JOIN vecs v ON v.id = ce.id
    CROSS JOIN range(0, {DIM}) AS d(dim)
),
upd{r} AS (
    SELECT cell, dim,
           (CAST(SUM(q) AS DOUBLE) / COUNT(*)) / {Q_SCALE}.0
               AS centroid_component,
           COUNT(*) AS n_members
    FROM comp{r}
    GROUP BY cell, dim
)"""


_FINAL = "SELECT cell, dim, centroid_component, CAST(n_members AS BIGINT) AS n_members FROM upd{r}"

KMEANS_STEP_SQL = f"WITH {_SEED_CTES},{_round_ctes(1)}\n{_FINAL.format(r=1)}"

KMEANS_FIT2_SQL = f"""WITH {_SEED_CTES},{_round_ctes(1)},
cents2 AS (
    SELECT cell AS cidx, list(centroid_component ORDER BY dim) AS cv
    FROM upd1 GROUP BY cell
),{_round_ctes(2)}
{_FINAL.format(r=2)}"""


def sum_seq(xs: list[float]) -> float:
    """Strict left-to-right float64 sum (explicit, so nobody 'optimizes' it
    into math.fsum/pairwise summation — order is the cross-engine
    contract)."""
    acc = 0.0
    for x in xs:
        acc += x
    return acc


def _empty_kmeans(spark: SparkSession) -> DataFrame:
    """Empty centroid-update result (graceful degradation: no vectors =>
    no cells), matching _assign_update's output schema."""
    from pyspark.sql import types as T

    return spark.createDataFrame(
        [],
        T.StructType(
            [
                T.StructField("cell", T.IntegerType()),
                T.StructField("dim", T.IntegerType()),
                T.StructField("centroid_component", T.DoubleType()),
                T.StructField("n_members", T.LongType()),
            ]
        ),
    )


def _fit_vectors(emb: DataFrame) -> DataFrame:
    """NULL / wrong-dimension vectors are excluded from the fit (review
    r7, mirrored in the oracle's `good` CTE): a NULL vector previously
    got ASSIGNED to cells[0] yet contributed zero posexplode rows to the
    update — n_members undercounted vs the oracle and a NULL seed would
    crash _seed_centroids."""
    return emb.filter(
        F.col("embedding").isNotNull() & (F.size("embedding") == DIM)
    )


def _assign_update(emb: DataFrame, cells: list[int], cvs: list[list[float]]) -> DataFrame:
    """One k-means round: scan-side nearest-centroid argmax against literal
    centroid vectors (``cells``-ascending order = the oracle's cidx ASC tie
    rule), then the fixed-point per-(cell, dim) mean."""
    # Python's sequential sum over float64 IS the oracle's left-to-right
    # list_reduce fold, and math.sqrt is the same IEEE sqrt — so these
    # literal norms are bit-identical to sqrt(dot(cv, cv)) in either engine.
    cnorms = [math.sqrt(sum_seq([x * x for x in cv])) for cv in cvs]
    vec = S._as_double(F.col("embedding"))
    vnorm = F.sqrt(S.dot(vec, vec))
    # try_divide: a zero-norm vector (or a zero-norm seed centroid) makes
    # the cosine 0/0 — NULL in DuckDB, DIVIDE_BY_ZERO under ANSI Spark.
    sims = F.array(
        *[
            F.try_divide(
                S.dot(vec, F.array(*[F.lit(x) for x in cv])),
                vnorm * F.lit(cn),
            )
            for cv, cn in zip(cvs, cnorms)
        ]
    )
    # array_max skips NULL sims (= the oracle's NULLS-LAST rank); an
    # all-NULL row (zero-norm vector) falls to the lowest centroid index,
    # exactly the oracle's `ORDER BY sim DESC, cidx ASC` tiebreak.
    pos = F.coalesce(F.array_position(sims, F.array_max(sims)), F.lit(1))
    cell_at = F.element_at(F.array(*[F.lit(c) for c in cells]), pos.cast("int"))
    assigned = emb.select(cell_at.alias("cell"), vec.alias("vec"))
    comp = assigned.select(
        "cell", F.posexplode("vec").alias("dim", "x")
    ).select(
        "cell",
        "dim",
        F.floor(F.col("x") * F.lit(float(Q_SCALE))).alias("q"),
    )
    return comp.groupBy("cell", "dim").agg(
        ((F.sum("q").cast("double") / F.count(F.lit(1))) / F.lit(float(Q_SCALE))).alias(
            "centroid_component"
        ),
        F.count(F.lit(1)).alias("n_members"),
    )


def _seed_centroids(emb: DataFrame) -> list[list[float]]:
    """Stride-seeded centroids, identical to the oracle's row_number stride
    (and to ivf_topk's seeding). Picked distributed via
    ``similarity.stride_seed_rows`` (ids-only rank + broadcast semi-join);
    driver-side materialization is exactly the K_LISTS seed rows."""
    cent_rows = S.stride_seed_rows(emb, "vec_id", "embedding", K_LISTS)
    return [[float(x) for x in r[1]] for r in cent_rows]


@register(
    "embedding_kmeans_step",
    tags=("ext", "ml", "kmeans", "iterative"),
    oracle=KMEANS_STEP_SQL,
)
def embedding_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact k-means iteration over the embeddings corpus: stride-seeded
    centroids, in-row cosine argmax assignment, fixed-point mean update.
    Output is the updated centroid matrix in long form (cell, dim,
    component) plus cluster sizes — k x dim rows regardless of corpus
    size. The oracle reproduces assignment via the equivalent rank-1
    window (sim DESC, cidx ASC == first-max argmax)."""
    emb = _fit_vectors(t(spark, sf_dir, "embeddings"))
    cvs = _seed_centroids(emb)
    if not cvs:  # empty corpus
        return _empty_kmeans(spark)
    return _assign_update(emb, list(range(len(cvs))), cvs)


@register(
    "embedding_kmeans_fit2",
    tags=("ext", "ml", "kmeans", "iterative"),
    oracle=KMEANS_FIT2_SQL,
)
def embedding_kmeans_fit2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO chained k-means rounds — the iterative fit, still fully
    hash-checked: round 1's k x dim centroid matrix collects to the driver
    (KBs, the connected_components fixpoint shape) and re-enters round 2 as
    literal vectors, while the oracle chains the identical rounds as CTEs
    (round-2 centroids = ``list(component ORDER BY dim)`` — the same
    doubles, hash-proven by the round-1 query). Cells that lose all members
    drop out on both engines (no empty-cell repair round). Per-round cost
    is one scan + one k x dim-row exchange at any corpus size."""
    emb = _fit_vectors(t(spark, sf_dir, "embeddings"))
    cvs = _seed_centroids(emb)
    if not cvs:  # empty corpus
        return _empty_kmeans(spark)
    r1 = _assign_update(emb, list(range(len(cvs))), cvs).collect()
    byc: dict[int, dict[int, float]] = {}
    for row in r1:
        byc.setdefault(row["cell"], {})[row["dim"]] = row["centroid_component"]
    cells2 = sorted(byc)
    cvs2 = [[byc[c][d] for d in sorted(byc[c])] for c in cells2]
    return _assign_update(emb, cells2, cvs2)
