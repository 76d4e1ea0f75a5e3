"""Deterministic dataset splitting and stratified sampling for training
pipelines.

- :func:`hash_split` — reproducible train/val/test assignment from a hash
  of the id: no RNG state, no shuffle, stable under re-runs, appends, and
  repartitioning (the property that matters when the corpus is rebuilt).
  The md5-derived bucket is engine-independent, so the split is
  SQL-auditable (oracle-gated in the inventory).
- :func:`stratified_sample` — per-stratum fractions via ``sampleBy``
  (seeded Bernoulli per row; approximate sizes, one pass, no shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from tantalus_spark.operators.spread import spread_small_scan


def split_bucket(id_col, n_buckets: int = 100, salt: str | None = None):
    """Deterministic bucket 0..n_buckets-1 from the row id: first 15 hex
    chars of md5(id) as int, mod n — identical in any engine. ``salt``
    prefixes the hashed string (``salt_id``) so two consumers hashing the
    same ids draw independent buckets."""
    key = id_col.cast("string")
    if salt is not None:
        key = F.concat_ws("_", F.lit(salt), key)
    h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10)
    return F.pmod(h.cast("long"), F.lit(n_buckets))


def hash_split(
    df: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    bucket_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split by cumulative hash-bucket ranges.

    ``fractions`` maps split name -> fraction (must sum to <= 1; remainder
    rows get the last split). E.g. {"train": .8, "val": .1, "test": .1}.
    """
    buckets = split_bucket(F.col(id_col))
    expr = None
    cum = 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        cond = buckets < int(round(cum * 100))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = names[-1]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(bucket_col, expr)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sampling (e.g. downsample dominant languages):
    one map pass, approximate per-group sizes, deterministic under the
    seed AND the input partitioning."""
    return df.sampleBy(strata_col, fractions, seed=seed)


def exact_stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "strat",
) -> DataFrame:
    """Exact-size per-stratum sampling: keep the first
    ``ceil(frac * stratum_size)`` rows of each stratum ordered by a
    deterministic md5 hash of the salted id.

    Unlike :func:`stratified_sample` (Bernoulli — sizes only approximate)
    this hits the requested size exactly, which matters when the mix
    recipe is a contract ("exactly 10% books"). Deterministic: no RNG
    state, stable under re-runs and repartitioning, and SQL-auditable
    (the hash order replays in any engine; oracle-gated in the
    inventory). Strata without an entry in ``fractions`` are dropped.

    Cost: one shuffle on the stratum key plus an in-partition sort —
    the price of exactness. A giant stratum sorts on one reducer chain;
    at 100 TB prefer :func:`hash_split` / :func:`weighted_mix` (percent
    precision, shuffle-free) unless exact counts are required, or
    pre-filter with a slightly loose hash threshold and rank only the
    survivors. Ties cannot occur (md5 of distinct salted ids collides
    only with ~2^-64 probability; ``id_col`` breaks even those).
    """
    frac_expr = None
    for name, frac in fractions.items():
        cond = F.col(strata_col) == name
        frac_expr = (F.when(cond, frac) if frac_expr is None
                     else frac_expr.when(cond, frac))
    frac_expr = frac_expr.otherwise(F.lit(None))
    hashed = df.withColumn("_frac", frac_expr).filter(
        F.col("_frac").isNotNull()
    ).withColumn(
        "_hk", F.md5(F.concat_ws("_", F.lit(salt), F.col(id_col).cast("string")))
    )
    w = W.partitionBy(strata_col).orderBy("_hk", id_col)
    ranked = hashed.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(W.partitionBy(strata_col)))
    kept = ranked.filter(
        F.col("_rn") <= F.ceil(F.col("_frac") * F.col("_n")))
    return kept.drop("_frac", "_hk", "_rn", "_n")


def weighted_mix(
    sources: dict[str, "DataFrame"],
    weights: dict[str, float],
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Deterministic weighted dataset mixing — the op that builds a
    training mix ("60% web, 30% code, 10% books") from cleaned sources.

    Each source keeps a hash-derived fraction of its rows equal to
    ``weights[name]`` and is tagged with its name. Selection is
    :func:`split_bucket` on the id SALTED WITH THE SOURCE NAME — without
    the salt, sources sharing ids would select fully correlated subsets
    (a 0.2 source's picks a strict subset of a 0.6 source's). No RNG,
    stable under re-runs, appends, and repartitioning, and SQL-auditable
    (the same md5-bucket rule as hash_split). Weights are quantized to
    whole percent (bucket space is 100). Union is by name; schemas must
    match across sources. One map pass per source, zero shuffles.
    """
    out = None
    for name, df in sources.items():
        frac = weights[name]
        picked = df.filter(
            split_bucket(F.col(id_col), salt=name) < int(round(frac * 100))
        ).withColumn(source_col, F.lit(name))
        out = picked if out is None else out.unionByName(picked)
    return out


def temperature_mix(
    df: DataFrame,
    alpha: float = 0.7,
    token_budget: int = 1_000_000,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-based source mixing (the T5 / Llama recipe): sampling
    weight per source proportional to ``n_tokens ^ alpha``. ``alpha=1``
    is proportional sampling (big sources dominate); ``alpha -> 0``
    approaches uniform-over-sources (small curated sources up-weighted).

    Returns one row per source: (source, n_docs, n_tokens, weight,
    sample_rate, target_tokens, repeat_factor) where ``target_tokens``
    is the source's share of ``token_budget`` and ``repeat_factor`` > 1
    means the source must repeat (epoch > 1) to fill its share — the
    actual decision table for a data-mixing run.

    Engine-exactness: token counts are integer sums; the single
    ``pow`` per source is quantized to a BIGINT microweight
    (``floor(n^alpha * 1e6 + 0.5)``), so the normalizing total is an
    exact integer sum and every derived ratio is one double division —
    no float summation anywhere (the repo's millibit pattern).

    Scale shape: one scan into a source-keyed aggregate (map-side
    partials; #sources rows out), then the scalar total folds in via a
    one-row action. The decision table is O(sources) — driver-safe.
    """
    from tantalus_spark.datapipe.textstats import tokens

    stats = (
        spread_small_scan(df)
        .groupBy(source_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(tokens(F.lower(F.col(text_col)))))
            .alias("n_tokens"),
        )
        .withColumn(
            "weight",
            F.floor(F.pow(F.col("n_tokens").cast("double"), F.lit(alpha))
                    * F.lit(1_000_000.0) + F.lit(0.5)).cast("long"),
        )
    )
    # The decision table is O(sources) rows: materialize it driver-side
    # (one action, no persist to leak — the r4 verdict flagged the
    # previous never-unpersisted .persist() here) and hand back a local,
    # broadcastable frame. total is then an exact Python-int sum.
    rows = stats.collect()
    total = sum(r["weight"] for r in rows)
    local = df.sparkSession.createDataFrame(rows, stats.schema)
    return (
        local
        .withColumn("sample_rate",
                    F.round(F.col("weight") / F.lit(float(total)), 6))
        .withColumn(
            "target_tokens",
            F.floor(F.lit(float(token_budget)) * F.col("weight")
                    / F.lit(float(total))).cast("long"),
        )
        .withColumn(
            "repeat_factor",
            F.round(F.col("target_tokens") / F.col("n_tokens"), 4),
        )
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "ws",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement in one pass —
    Efraimidis & Spirakis A-ES ("Weighted random sampling with a
    reservoir", IPL 2006): each row draws a uniform ``u`` and is ranked
    by the key ``ln(u) / w``; the k LARGEST keys are exactly a weighted
    sample without replacement (a row's inclusion probability is
    proportional to its weight at every step of the sequential
    process).

    ``u`` is not random state but a deterministic md5-derived uniform —
    ``(h + 0.5) / 2^60`` with ``h`` the first 15 hex chars of
    ``md5(salt_id)`` (the :func:`split_bucket` engine-portable hash
    family) — so the sample replays bit-identically in any engine and
    any partition order, and ``salt`` yields independent re-draws.
    ``u`` is never 0 or 1, so ``ln(u)`` is finite and keys are distinct
    with probability 1 (md5 of distinct salted ids).

    Scale shape: one projection computes the key, the top-k is
    ``TakeOrderedAndProject`` — a per-partition heap + driver merge of
    k rows, NEVER a global sort; the corpus is read once and nothing
    corpus-sized shuffles. This is the production "draw a quality-
    weighted eval set from 100 TB" primitive. Rows with
    ``weight <= 0``, NULL, or NaN weight are excluded (zero weight =
    zero inclusion probability; the log form needs w > 0 — and Spark
    orders NaN as GREATER than every number, so an unguarded NaN
    weight would yield a NaN key that sorts to the top and hijacks the
    sample)."""
    key = F.col(id_col).cast("string")
    h = F.conv(
        F.substring(F.md5(F.concat_ws("_", F.lit(salt), key)), 1, 15),
        16, 10).cast("long")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(2 ** 60))
    es_key = F.log(u) / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col).isNotNull()
                  & ~F.isnan(F.col(weight_col).cast("double"))
                  & (F.col(weight_col) > F.lit(0)))
          .withColumn("_es_key", es_key)
          .orderBy(F.col("_es_key").desc(), F.col(id_col).asc())
          .limit(int(k))
          # select on FULL precision (IEEE-identical in every engine);
          # round only the reported key
          .withColumn("sample_key", F.round(F.col("_es_key"), 6))
          .drop("_es_key")
    )


def group_split(
    df: DataFrame,
    fractions: dict[str, float],
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_col: str = "split",
    cluster_map: DataFrame | None = None,
) -> DataFrame:
    """Leakage-free train/val/test split: whole duplicate FAMILIES land
    in one split (scikit-learn's GroupShuffleSplit at corpus scale).
    :func:`hash_split` on raw ids puts two copies of the same document
    in different splits with probability ~(1-Σf²) — exactly the
    contamination :func:`split_leakage` measures; splitting on the
    family's CANONICAL id makes that impossible by construction.

    Base tier (always on): family key = the NFC-normalized digest's
    minimum id (:func:`~.textstats.normalized_dup_groups` canonical);
    every member hashes the canonical id through the same md5 bucket
    ranges as :func:`hash_split`, so singleton corpora reproduce
    hash_split exactly. Null-text rows are excluded (no content to
    group by). Returns (id, canonical_id, split) — join back to
    payloads on id.

    Near-dup tier (``cluster_map``): pass a frozen (id, cluster
    canonical) frame — ``dup_clusters`` / ``semantic_dup_clusters``
    output, or any precomputed family map — and near-duplicate twins
    that are NOT byte-/NFC-equal also land in one split. The cluster
    canonical is lifted to the NFC-family level (min cluster canonical
    per NFC group, one aggregate over the map-sized join), so the two
    tiers compose: NFC-equal docs always share a family, and cluster
    twins share one whenever the map assigns them one canonical.
    Closure across CHAINS of alternating tiers (doc A NFC-equal B,
    B near-dup C, C NFC-equal D...) is the iterative connected-
    components job's responsibility (``dup_clusters``) — feed its
    transitive output here rather than raw pair edges.

    Scale: one Arrow NFC pass + one 16-byte digest shuffle + a
    digest-keyed canonical-map shuffle join (the map is O(distinct
    digests) — corpus-scale, NOT broadcast-sized; only the 16-byte
    digest and two ids travel); the cluster tier adds one id-keyed join
    against the (already corpus-bounded) cluster map + one map-sized
    aggregate; the split itself is a map-side expression."""
    from tantalus_spark.datapipe.textstats import normalize_nfc

    n = normalize_nfc(df.filter(F.col(text_col).isNotNull()),
                      text_col=text_col, id_col=id_col) \
        .select(F.col(id_col), "norm_digest")
    canon = n.groupBy("norm_digest").agg(
        F.min(id_col).alias("canonical_id"))
    members = n.join(canon, "norm_digest").select(id_col, "canonical_id")
    if cluster_map is not None:
        cl_id, cl_canon = cluster_map.columns[:2]
        cmap = cluster_map.select(
            F.col(cl_id).alias(id_col),
            F.col(cl_canon).alias("_cl"))
        # lift the cluster canonical to the NFC-family level so the
        # tiers agree: every member of an NFC family gets the family's
        # minimum cluster canonical (or keeps the NFC canonical when no
        # member is clustered)
        fam = (members.join(cmap, id_col, "left")
                      .groupBy("canonical_id")
                      .agg(F.min("_cl").alias("_fam_cl")))
        members = (members.join(fam, "canonical_id")
                          .select(F.col(id_col),
                                  F.coalesce("_fam_cl", "canonical_id")
                                  .alias("canonical_id")))
    return hash_split(members, fractions, id_col="canonical_id",
                      bucket_col=bucket_col)
