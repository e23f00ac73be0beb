"""Document deduplication operators for training-data pipelines.

Four families, each a DataFrame-in / DataFrame-out operator:

* ``exact_dedup`` — hash-groupBy on md5(text): one shuffle on the digest,
  map-side partial agg; the canonical first pass at 100 TB.
* ``minhash_lsh_pairs`` — shingle -> 64-perm MinHash -> banded LSH
  bucket-join -> exact-Jaccard verify. Candidate generation never compares
  all pairs: docs meet only inside (band, bucket) groups, so the shuffle
  key is the band hash and hot buckets are bounded by ``max_bucket``.
* ``simhash_pairs`` — 64-bit SimHash, banded by 4x16-bit chunks (any pair
  at Hamming distance <= 3 shares at least one exact chunk — pigeonhole),
  then exact Hamming verify.
* embedding near-dup lives in operators.ann (cosine_topk with a threshold).

Signatures are computed in Arrow-batched ``mapInPandas`` with numpy-
vectorized permutation minima; shingle hashes are a rolling polynomial
over cached md5-low-64 word hashes (one digest per DISTINCT word per
worker), so only tokenization walks Python strings.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from ..plans.iterate import loop_checkpoint

MERSENNE_P = (1 << 61) - 1
N_PERM = 64
N_BANDS = 16  # x 4 rows per band


def _perm_params(seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    # a < 2^31 keeps every intermediate product below 2^63: a*hi < 2^60 and
    # a*lo < 2^63, so the mod-P arithmetic is exact in uint64 (no wrapping)
    a = rng.integers(1, 1 << 31, size=N_PERM, dtype=np.uint64)
    b = rng.integers(0, MERSENNE_P, size=N_PERM, dtype=np.uint64)
    return a, b


_POLY = np.uint64(0x9E3779B97F4A7C15)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized (uint64 wrap arithmetic)."""
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def shingle_hashes(text: str, w: int = 3, _cache: dict | None = None) -> np.ndarray:
    """w-word shingle hashes, vectorized.

    Per document: md5-low-64 each DISTINCT word once (cross-doc cache),
    then a rolling order-sensitive polynomial over the word-hash vector +
    a splitmix64 finalizer — one numpy pass instead of one digest call per
    shingle. Deterministic; collision odds are the generic 64-bit birthday
    bound, which the exact-Jaccard verify consumes as set sizes only.
    """
    words = text.split()
    if not words:
        return np.empty(0, dtype=np.uint64)
    hv = np.empty(len(words), dtype=np.uint64)
    if _cache is None:
        _cache = {}
    for i, wd in enumerate(words):
        h = _cache.get(wd)
        if h is None:
            h = word_hash_md5_low(wd)
            _cache[wd] = h
        hv[i] = h
    k = min(w, len(words))
    n = len(words) - k + 1
    acc = hv[:n].copy()
    for j in range(1, k):
        acc = acc * _POLY + hv[j : j + n]
    return _mix64(acc)


def minhash_signature(hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N_PERM,) signature: min over shingles of (a*h + b) mod p."""
    if hashes.size == 0:
        return np.full(N_PERM, np.iinfo(np.uint64).max, dtype=np.uint64)
    # fully broadcast (n_perm, n_shingles): a*h mod p split as
    # ((a*hi mod p) << 32 mod p) + (a*lo mod p); with a < 2^31 every
    # product stays below 2^63 so uint64 arithmetic is exact
    p = np.uint64(MERSENNE_P)
    h = hashes % p
    lo = (h & np.uint64(0xFFFFFFFF))[None, :]
    hi = (h >> np.uint64(32))[None, :]
    A = a[:, None]
    t_hi = (A * hi) % p  # < 2^61
    # (t_hi * 2^32) mod p without overflow: with p = 2^61 - 1, 2^61 ≡ 1,
    # so split t_hi = u_hi*2^29 + u_lo -> t_hi*2^32 ≡ u_hi + u_lo*2^32
    u_hi = t_hi >> np.uint64(29)
    u_lo = t_hi & np.uint64((1 << 29) - 1)
    shifted = (u_hi + (u_lo << np.uint64(32))) % p
    t = (shifted + (A * lo) % p + b[:, None]) % p
    return t.min(axis=1)


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    sa, sb = set(a.tolist()), set(b.tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def exact_dedup(docs_df, id_col: str = "doc_id", text_col: str = "text"):
    """Groups of byte-identical documents: (dup_key, n_docs, keeper_id)."""
    return (
        docs_df.groupBy(F.md5(F.col(text_col).cast("binary")).alias("dup_key"))
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("keeper_id"),
        )
    )


BANDS_SCHEMA = "doc_id long, band int, bucket long"
SIG_SCHEMA = "doc_id long, sig array<long>"


def minhash_signatures(docs_df, id_col: str = "doc_id", text_col: str = "text",
                       w: int = 3, seed: int = 42):
    """(doc_id, sig array<long>) — one Arrow pass; the signature is the
    reusable LSH artifact (at 100 TB it would be checkpointed via
    plans.manifest and every downstream stage reads it back)."""
    a, b = _perm_params(seed)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict = {}
        for pdf in batches:
            ids, sigs = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                sig = minhash_signature(shingle_hashes(text, w, cache), a, b)
                ids.append(int(doc_id))
                sigs.append(sig.view(np.int64).tolist())
            yield pd.DataFrame({"doc_id": ids, "sig": sigs})

    from ..plans.partitioning import spread

    return spread(docs_df.select(id_col, text_col)).mapInPandas(gen, SIG_SCHEMA)


def minhash_bands(docs_df, id_col: str = "doc_id", text_col: str = "text",
                  w: int = 3, seed: int = 42, sigs=None):
    """(doc_id, band, bucket) rows — the LSH shuffle key table.

    Band buckets are derived JVM-side (xxhash64 over the signature slice —
    whole-stage codegen, no second Python pass over the corpus)."""
    if sigs is None:
        sigs = minhash_signatures(docs_df, id_col, text_col, w, seed)
    rpb = N_PERM // N_BANDS
    band_structs = F.array(
        *[
            F.struct(
                F.lit(band).alias("band"),
                F.xxhash64(F.slice("sig", band * rpb + 1, rpb)).alias("bucket"),
            )
            for band in range(N_BANDS)
        ]
    )
    return sigs.select("doc_id", F.explode(band_structs).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


PREFILTER_MIN_DOCS = 100_000


def minhash_lsh_pairs(docs_df, id_col: str = "doc_id", text_col: str = "text",
                      threshold: float = 0.7, w: int = 3, seed: int = 42,
                      max_bucket: int = 64, prefilter_margin: float = 0.25,
                      prefilter: bool | None = None):
    """Near-duplicate pairs (id_a < id_b, jaccard >= threshold).

    Bucket-join candidate generation, then (on large corpora) a SIGNATURE
    prefilter — estimated Jaccard = matching-row fraction, computed
    JVM-side on the 512-byte signatures — so only the survivors join the
    full texts for the exact shingle-Jaccard verify: at scale the candidate
    shuffle carries signatures, never the corpus. ``prefilter_margin``
    keeps any pair whose estimate is within 4 sigma (64 perms -> sigma
    ~= 0.0625) of the threshold; a true pair is dropped only when its
    estimate lands beyond 4 sigma low (~3e-5 per pair) — near-certain, not
    certain. Pass ``prefilter=False`` for the exact post-banding verify on
    every candidate (exactness-sensitive runs), ``prefilter=True`` to
    force it; the default probes whether the corpus reaches
    ``PREFILTER_MIN_DOCS`` (a LIMIT-bounded count, never a full scan) —
    below that the two extra by-id joins cost more than shipping the texts.
    ``max_bucket`` caps degenerate buckets (e.g. boilerplate shingles) — a
    skew guard: capped buckets are dropped, trading recall on pathological
    keys for bounded work.

    The persisted signature table lives until the session ends or the
    caller runs ``spark.catalog.clearCache()`` (long-lived sessions own
    their cache).
    """
    # the signature stage feeds two different exchanges (band buckets and
    # the by-id prefilter joins); persist so the corpus-wide shingle+perm
    # pass runs once — the in-session analogue of checkpointing the
    # signature table (plans.manifest) in a long-lived pipeline
    sigs = minhash_signatures(docs_df, id_col, text_col, w, seed).persist()
    bands = minhash_bands(docs_df, id_col, text_col, w, seed, sigs=sigs)
    sized = bands.withColumn(
        "bsize", F.count("*").over(Window.partitionBy("band", "bucket"))
    ).filter(F.col("bsize") <= max_bucket)
    left = sized.select(F.col("doc_id").alias("id_a"), "band", "bucket")
    right = sized.select(F.col("doc_id").alias("id_b"), "band", "bucket")
    cand = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    if prefilter is None:
        # switchover heuristic: the prefilter pays for itself once the
        # candidate texts would dominate the shuffle — proxied by corpus
        # size. limit(n).count() short-circuits after n rows, so the probe
        # is O(PREFILTER_MIN_DOCS) regardless of corpus size.
        prefilter = (
            docs_df.select(id_col).limit(PREFILTER_MIN_DOCS).count()
            >= PREFILTER_MIN_DOCS
        )
    if prefilter:
        sig_a = sigs.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("sig_a"))
        sig_b = sigs.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("sig_b"))
        est = F.aggregate(
            F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, v: acc + v,
        ) / F.lit(N_PERM)
        survivors = (
            cand.join(sig_a, "id_a")
            .join(sig_b, "id_b")
            .filter(est >= F.lit(threshold - prefilter_margin))
            .select("id_a", "id_b")
        )
    else:
        survivors = cand
    texts = docs_df.select(F.col(id_col).alias("_tid"), F.col(text_col).alias("_text"))
    joined = (
        survivors.join(texts.withColumnRenamed("_tid", "id_a").withColumnRenamed("_text", "text_a"), "id_a")
        .join(texts.withColumnRenamed("_tid", "id_b").withColumnRenamed("_text", "text_b"), "id_b")
    )

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict = {}
        for pdf in batches:
            rows = []
            for id_a, id_b, ta, tb in zip(
                pdf["id_a"], pdf["id_b"], pdf["text_a"], pdf["text_b"]
            ):
                j = jaccard(shingle_hashes(ta, w, cache), shingle_hashes(tb, w, cache))
                if j >= threshold:
                    rows.append((int(id_a), int(id_b), float(j)))
            yield pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard"])

    # force=True: the verify stage inherits the candidate join's
    # exchange, which AQE coalesces by BYTES — a few MB of pair texts
    # collapse to one task, serializing the per-pair shingle hashing.
    # Python verify cost per row dwarfs one round-robin re-shuffle of
    # the (already candidate-pruned) pair rows, so fan out explicitly.
    from ..plans.partitioning import spread

    return spread(joined, force=True).mapInPandas(
        verify, "id_a long, id_b long, jaccard double")


def shingle_sets(docs_df, w: int = 3, id_col: str = "doc_id",
                 text_col: str = "text"):
    """The DISTINCT (doc_id, shingle) inverted index — the shared input
    of every exact-shingle operator here (``ngram_jaccard_pairs``,
    ``prefix_jaccard_pairs``, ``shingle_containment_pairs``). Built as
    split -> shingle index explode -> DISTINCT, all-JVM; at scale this
    is the structure a dedup pipeline materializes ONCE and feeds to
    each verify/candidate tier, so callers may persist the result and
    pass it back via the operators' ``ds=`` parameter instead of
    paying the tokenize+explode+distinct scan per operator.

    Shingle indexing is 1-based over a literal-space split (empty
    tokens kept), mirroring the SQL oracle token-for-token; documents
    with fewer than ``w`` tokens contribute no shingles.
    """
    from ..plans.partitioning import spread

    toks = F.split(F.col(text_col), " ")
    base = spread(docs_df.select(
        F.col(id_col).alias("doc_id"), toks.alias("toks")
    ).filter(F.size("toks") >= w))
    idx = base.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(1), F.size("toks") - (w - 1))).alias("i"),
    )
    shingle = F.concat_ws(
        " ", *[F.element_at("toks", F.col("i") + F.lit(k)) for k in range(w)]
    )
    return idx.select("doc_id", shingle.alias("shingle")).distinct()


def shingle_sid_sets(docs_df, w: int = 3, id_col: str = "doc_id",
                     text_col: str = "text"):
    """Dictionary-encoded ``shingle_sets``: the same DISTINCT
    (doc_id, shingle) index with every shingle string replaced by a
    dense INT id assigned in ascending (global doc-frequency, shingle)
    order. The mapping is a bijection, so every set operator downstream
    (equi-join intersection counts, set sizes) is unchanged, and it is
    order-isomorphic to the (df, shingle) total order the AllPairs
    prefix filter sorts by, so ``prefix_jaccard_pairs`` can order by
    the id alone — the join/shuffle key narrows from a ~25-byte shingle
    string to 4 bytes (guide §2.3 "narrower types"), which shrinks
    every exchange in the family's joins.

    Id assignment is the scalable two-pass zipWithIndex shape: range-
    partition the dictionary by the sort key, rank within partitions,
    add per-partition offsets. The only driver-side step collects one
    row count PER PARTITION (bounded by the shuffle-partition count,
    never by dictionary size). Range-boundary sampling variance cannot
    change the ids: partitions tile the (df, shingle) order, so
    offset + within-partition rank is the exact global dense rank
    wherever the boundaries fall.
    """
    spark = docs_df.sparkSession
    ds = shingle_sets(docs_df, w, id_col, text_col).localCheckpoint(
        eager=False)
    freq = ds.groupBy("shingle").agg(F.count("*").alias("df"))
    nparts = max(2, int(spark.conf.get("spark.sql.shuffle.partitions")))
    ranked = (
        freq.repartitionByRange(nparts, "df", "shingle")
        .withColumn("pid", F.spark_partition_id())
        .withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy("pid").orderBy("df", "shingle")),
        )
        .localCheckpoint(eager=False)
    )
    counts = ranked.groupBy("pid").agg(F.count("*").alias("c")).collect()
    off, acc = {}, 0
    for row in sorted(counts, key=lambda r: r["pid"]):
        off[row["pid"]] = acc
        acc += row["c"]
    off_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in off.items()], "pid int, off long")
    sid = ranked.join(F.broadcast(off_df), "pid").select(
        "shingle", (F.col("off") + F.col("r")).cast("int").alias("sid"))
    return ds.join(sid, "shingle").select(
        "doc_id", F.col("sid").alias("shingle"))


def ngram_jaccard_pairs(docs_df, threshold: float = 0.5, w: int = 3,
                        id_col: str = "doc_id", text_col: str = "text",
                        ds=None):
    """EXACT n-gram (w-word shingle) Jaccard near-dup pairs — all-JVM.

    Pure DataFrame composition, no Python stage anywhere: split -> shingle
    index explode -> DISTINCT shingle set -> shingle equi-join counts the
    intersection -> set-size joins -> threshold filter. Whole-stage codegen
    end to end; the inverted shingle index (the ``ds`` table) is the same
    structure a 100 TB dedup would materialize once and reuse.

    Exactness costs skew-exposure: a boilerplate shingle shared by k docs
    contributes k^2 join rows (no ``max_bucket`` guard here, because
    dropping it would change the EXACT answer). ``minhash_lsh_pairs`` is
    the skew-capped approximate-candidate variant of the same contract;
    at scale run that first and reserve this operator for the verify tier.

    Shingle indexing is 1-based over a literal-space split (empty tokens
    kept), mirroring the SQL oracle token-for-token; documents with fewer
    than ``w`` tokens contribute no shingles. ``ds``: optionally pass a
    prebuilt (persisted) ``shingle_sets`` index to share its scan with
    sibling operators.
    """
    if ds is None:
        ds = shingle_sets(docs_df, w, id_col, text_col)
    sizes = ds.groupBy("doc_id").agg(F.count("*").alias("n"))
    left = ds.select(F.col("doc_id").alias("id_a"), "shingle")
    right = ds.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (
        left.join(right, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("i"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("id_a"),
                                F.col("n").alias("na")), "id_a")
        .join(sizes.select(F.col("doc_id").alias("id_b"),
                           F.col("n").alias("nb")), "id_b")
        .withColumn(
            "jaccard",
            F.col("i") * F.lit(1.0) / (F.col("na") + F.col("nb") - F.col("i")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def dedup_clusters(docs_df, pairs_df, id_col: str = "doc_id"):
    """Fuzzy-dedup completion: connected components over near-dup pairs.

    Pair detection (minhash/simhash/ngram/embedding) yields EDGES; what a
    training-data pipeline actually needs is one keeper per duplicate
    CLUSTER — the transitive closure. Min-label propagation with pointer
    jumping: every doc starts labeled with its own id; each round takes
    the min over neighbors' labels, then compresses one level of
    indirection (lbl <- lbl[lbl], the Wyllie/pointer-doubling step), so
    convergence is O(log diameter) rounds, not O(diameter) — chains of
    adjacent grid cells (`operators/clustering.py`) would otherwise need
    a round per link. Each round is two JVM joins + one aggregate; the
    DRIVER only runs the convergence loop (bounded by log(diameter),
    never by corpus size — the same shape GraphX/Pregel uses). Every
    round materializes via ``plans.iterate.loop_checkpoint`` — a lazy
    localCheckpoint that ALSO resets the checkpoint-inherited size
    statistics: the loop body references ``labels`` twice, so without
    plan truncation the logical tree doubles per round, and without the
    stats reset the inherited sizeInBytes estimates multiply per round
    until Catalyst's stats visitor grinds million-digit BigInteger
    products (see plans/iterate.py for the measured failure curve). (On a real cluster with
    executor churn, swap in reliable ``checkpoint()`` — same contract,
    see plans/manifest.py for the durable variant.) Returns
    (doc_id, cluster_id) for every document; singletons label themselves;
    cluster_id = min doc id of the component (the keeper).
    """
    e = pairs_df.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    # one up-front shuffle onto the per-round join key: localCheckpoint
    # preserves outputPartitioning, so every round's edges-side of the
    # neighbor join (the largest table in the loop) reuses this layout
    # instead of re-exchanging — saves one edge shuffle per round
    edges = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).repartition("dst").localCheckpoint(eager=False)
    # The loop runs ONLY over nodes that appear in an edge: singletons
    # (the overwhelming majority of a deduped corpus — and of a road
    # network's crossing graph) can never change label, so hauling them
    # through every iteration's joins and checkpoints just multiplies
    # per-round cost; they rejoin as self-labeled rows at the end.
    labels = (
        edges.select(F.col("src").alias("id")).distinct()
        .withColumn("lbl", F.col("id"))
        .localCheckpoint(eager=False)
    )
    # Convergence check: labels only ever DECREASE under min-propagation,
    # so the label sum is strictly monotone until the fixpoint — one
    # aggregate per round instead of an old-vs-new join. Summed in
    # decimal(38,0) so corpus-scale id sums cannot overflow/wrap. The
    # checkpoints are LAZY: this aggregate is the single Spark job per
    # round, materializing the round's checkpoint as a side effect
    # (eager checkpoints would double the job count, and driver-side
    # job latency — not data — dominates small/medium graphs).
    prev_sum = None
    while True:
        nbr = (
            edges.join(
                labels.select(
                    F.col("id").alias("dst"), F.col("lbl").alias("nlbl")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("nlbl").alias("minnbr"))
            .withColumnRenamed("src", "id")
        )
        stepped = labels.join(nbr, "id", "left").select(
            "id",
            F.least(
                F.col("lbl"), F.coalesce("minnbr", F.col("lbl"))
            ).alias("lbl"),
        )
        # pointer jumping: follow one level of labels (lbl <- lbl[lbl]).
        # lbl always names a node id (mins of node ids), so the self-join
        # below always finds it; halves remaining path lengths per round.
        hop = stepped.select(
            F.col("id").alias("lbl"), F.col("lbl").alias("lbl2")
        )
        new_labels = loop_checkpoint(
            stepped.join(hop, "lbl", "left")
            .select("id", F.coalesce("lbl2", "lbl").alias("lbl"))
        )
        cur_sum = new_labels.agg(
            F.sum(F.col("lbl").cast("decimal(38,0)"))
        ).collect()[0][0]
        labels.unpersist()
        labels = new_labels
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    singletons = (
        docs_df.select(F.col(id_col).alias("id"))
        .join(labels.select("id"), "id", "left_anti")
        .withColumn("lbl", F.col("id"))
    )
    out = labels.unionByName(singletons)
    edges.unpersist()
    return out.select(
        F.col("id").alias(id_col), F.col("lbl").alias("cluster_id")
    )


def decontaminate(train_df, heldout_df, text_col: str = "text"):
    """Remove training documents whose exact text appears in a held-out
    set — the decontamination pass every evaluation-aware corpus build
    runs. Anti-join on md5(text): the held-out fingerprint set is
    typically small (benchmarks), so Catalyst broadcasts it and the
    training corpus never shuffles; with a huge held-out side it degrades
    gracefully to a shuffle anti-join on the digest.
    """
    fp = F.md5(F.col(text_col).cast("binary")).alias("_fp")
    train = train_df.withColumn("_fp", fp)
    seen = heldout_df.select(fp).distinct()
    return train.join(seen, "_fp", "left_anti").drop("_fp")


def ngram_decontaminate(train_df, heldout_df, n: int = 5,
                        id_col: str = "doc_id", text_col: str = "text"):
    """N-gram-overlap decontamination (the GPT-3 recipe): drop a training
    document if it shares ANY word n-gram with the held-out set — far
    stricter than exact-text matching, which misses partial copies and
    quote-level leakage.

    Plan: both sides explode to (doc, md5(n-gram)); the held-out gram set
    is DISTINCT and benchmark-sized, so the contaminated-id probe is a
    broadcast semi join on the digest — the training corpus shuffles
    ZERO bytes; then a broadcast anti join removes the contaminated ids.
    With a pathological held-out side both joins degrade to hash
    shuffles on the 16-byte digest, never on text.
    """
    w = int(n)
    # CASE guard: sequence(1, 0) in Spark is the DESCENDING [1, 0], so a
    # doc shorter than n words must yield an empty gram array explicitly
    grams = F.expr(
        f"explode(CASE WHEN size(split(trim({text_col}), ' ')) >= {w} THEN "
        f"transform(sequence(1, size(split(trim({text_col}), ' ')) - {w - 1}),"
        f" i -> md5(array_join(slice(split(trim({text_col}), ' '), i, {w}), ' '))) "
        "ELSE array() END)"
    )
    from ..plans.partitioning import spread

    held_grams = spread(heldout_df.select(text_col)).select(
        grams.alias("g")).distinct()
    train_grams = spread(train_df.select(id_col, text_col)).select(
        F.col(id_col).alias("_tid"), grams.alias("g"))
    contaminated = (
        train_grams.join(held_grams, "g", "left_semi").select("_tid").distinct()
    )
    return train_df.join(
        contaminated, train_df[id_col] == contaminated["_tid"], "left_anti"
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def word_hash_md5_low(word: str) -> int:
    """uint64 word hash == DuckDB's ``md5_number_lower``: little-endian of
    md5 digest bytes 8..16 — the oracle computes the IDENTICAL hash in SQL,
    so the whole SimHash pipeline is cross-engine checkable."""
    return int.from_bytes(hashlib.md5(word.encode("utf-8")).digest()[8:16], "little")


def simhash64(text: str, _cache: dict | None = None) -> int:
    """64-bit SimHash over word hashes — vectorized.

    Per document: hash the DISTINCT words once (with an optional cross-doc
    cache), unpack all 64 bits of every hash in one ``np.unpackbits``, and
    reduce with a single (+-1 weight x count) matmul — no per-word Python
    beyond the md5 call itself.
    """
    words = text.split()
    if not words:
        return 0
    uniq, counts = np.unique(words, return_counts=True)
    hv = np.empty(len(uniq), dtype=np.uint64)
    if _cache is None:
        for i, w in enumerate(uniq):
            hv[i] = word_hash_md5_low(w)
    else:
        for i, w in enumerate(uniq):
            h = _cache.get(w)
            if h is None:
                h = word_hash_md5_low(w)
                _cache[w] = h
            hv[i] = h
    # bit j of flat row == (h >> j) & 1: little-endian byte view + little
    # bitorder keeps numpy's layout aligned with the arithmetic definition
    bits = np.unpackbits(
        hv.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
    ).astype(np.int64)
    acc = (2 * bits - 1).T @ counts.astype(np.int64)  # (64,) signed sums
    out = int(
        np.packbits((acc > 0).astype(np.uint8), bitorder="little")
        .view(np.uint64)[0]
    )
    return out - (1 << 64) if out >= (1 << 63) else out


def simhash_pairs(docs_df, id_col: str = "doc_id", text_col: str = "text",
                  max_hamming: int = 3):
    """Pairs at Hamming distance <= max_hamming (banded exact search).

    The persisted band table (4 rows/doc) lives until the session ends or
    the caller runs ``spark.catalog.clearCache()``.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict = {}
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                sh = simhash64(text, cache)
                u = sh & 0xFFFFFFFFFFFFFFFF
                for band in range(4):
                    rows.append(
                        (int(doc_id), sh, band, (u >> (band * 16)) & 0xFFFF)
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "simhash", "band", "chunk"])

    from ..plans.partitioning import spread

    # 4 rows/doc; persisted so the signature stage runs once instead of
    # once per self-join side (exchange reuse does not cover it)
    bands = spread(docs_df.select(id_col, text_col)).mapInPandas(
        gen, "doc_id long, simhash long, band int, chunk int"
    ).persist()
    left = bands.select(
        F.col("doc_id").alias("id_a"), F.col("simhash").alias("sh_a"), "band", "chunk"
    )
    right = bands.select(
        F.col("doc_id").alias("id_b"), F.col("simhash").alias("sh_b"), "band", "chunk"
    )
    cand = (
        left.join(right, ["band", "chunk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def chunk_dedup(docs_df, chunk_words: int = 8,
                id_col: str = "doc_id", text_col: str = "text"):
    """Sub-document (CCNet-style paragraph) dedup over fixed word chunks.

    Web corpora repeat at the PARAGRAPH level (boilerplate, quoted
    reposts) far more than at whole-document level; CCNet dedups on
    normalized paragraph hashes. The driver corpus has no newlines, so
    the "paragraph" here is a deterministic chunk of ``chunk_words``
    consecutive whitespace tokens (last chunk may be short).

    Keep rule: a chunk survives iff it is the globally FIRST occurrence
    of its text, ordering by (doc_id, chunk_idx) — exactly CCNet's
    first-writer-wins over a corpus-wide hash partition.

    Output per doc: (doc_id, n_chunks, n_kept, kept_words) — BIGINTs.

    Plan: split -> chunk (JVM transform over token array, no Python) ->
    one hash-keyed shuffle for the global first-occurrence window ->
    per-doc re-agg. The window per hash group is tiny (duplicate count),
    so no skew pathology; a pathological 10^9-copy chunk is still one
    (hash, min(doc,idx)) reduction away — swap row_number for a min_by
    semi-join if a corpus ever hits that.
    """
    from pyspark.sql import Window

    from ..plans.partitioning import spread

    w = int(chunk_words)
    chunks = spread(docs_df.select(id_col, text_col)).select(
        F.col(id_col).alias("doc_id"),
        F.expr(
            "posexplode(transform("
            f"  sequence(0, CAST(ceil(size(split(trim({text_col}), ' ')) / {w}.0) AS INT) - 1),"
            f"  i -> array_join(slice(split(trim({text_col}), ' '), i * {w} + 1, {w}), ' ')"
            "))"
        ).alias("chunk_idx", "chunk"),
    ).filter(F.col("chunk") != "")
    hashed = chunks.select(
        "doc_id", "chunk_idx",
        F.md5(F.col("chunk")).alias("h"),
        (F.size(F.split(F.col("chunk"), " "))).cast("long").alias("n_words"),
    )
    first = Window.partitionBy("h").orderBy("doc_id", "chunk_idx")
    kept = hashed.withColumn("rn", F.row_number().over(first))
    return kept.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_chunks"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).cast("long")
        .alias("n_kept"),
        F.sum(F.when(F.col("rn") == 1, F.col("n_words")).otherwise(0))
        .cast("long").alias("kept_words"),
    )


def boilerplate_chunks(docs_df, chunk_words: int = 8, min_df: int = 2,
                       pct_den: int = 20, id_col: str = "doc_id",
                       text_col: str = "text", src_col: str = "source"):
    """Within-source boilerplate detection (CCNet/RefinedWeb line filter).

    Web boilerplate (nav bars, footers, cookie banners) repeats across
    MOST pages of a site but not across sites, so it is invisible to
    global dedup: the filter is per-SOURCE document frequency. A chunk
    (fixed ``chunk_words``-token window, same segmentation as
    ``chunk_dedup``) is boilerplate within its source iff it appears in
    >= max(min_df, source_docs/pct_den) distinct documents of that
    source (df * pct_den >= source_docs, exact integers — default 5%).

    Output per doc: (doc_id, n_chunks, n_boiler, boiler_words).

    Plan: chunk explode (JVM transform) -> hash agg per (source, chunk
    hash) for df -> join a broadcast 1-row-per-source doc-count dim ->
    semi-shape join back to the chunk stream on (source, hash). The df
    table is bounded by distinct chunks with df >= 2 (tiny vs the
    corpus); AQE broadcasts it at real sizes, and the join key includes
    the source so a cross-site mega-chunk cannot concentrate one
    reducer.
    """
    from ..plans.partitioning import spread

    w = int(chunk_words)
    chunks = spread(docs_df.select(id_col, src_col, text_col)).select(
        F.col(id_col).alias("doc_id"),
        F.col(src_col).alias("source"),
        F.expr(
            "posexplode(transform("
            f"  sequence(0, CAST(ceil(size(split(trim({text_col}), ' ')) / {w}.0) AS INT) - 1),"
            f"  i -> array_join(slice(split(trim({text_col}), ' '), i * {w} + 1, {w}), ' ')"
            "))"
        ).alias("chunk_idx", "chunk"),
    ).filter(F.col("chunk") != "")
    # the hashed chunk stream feeds BOTH the df aggregate and the
    # join-back scan: lazily checkpoint it so the split+chunk+md5 pass
    # over the corpus runs once, not once per consumer
    hashed = chunks.select(
        "doc_id", "source",
        F.md5(F.col("chunk")).alias("h"),
        F.size(F.split(F.col("chunk"), " ")).cast("long").alias("n_words"),
    ).localCheckpoint(eager=False)
    df_stats = hashed.groupBy("source", "h").agg(
        F.countDistinct("doc_id").alias("df")
    )
    src_docs = docs_df.groupBy(F.col(src_col).alias("source")).agg(
        F.countDistinct(id_col).alias("source_docs")
    )
    boiler = (
        df_stats.join(F.broadcast(src_docs), "source")
        .filter(
            (F.col("df") >= int(min_df))
            & (F.col("df") * int(pct_den) >= F.col("source_docs"))
        )
        .select("source", "h", F.lit(1).alias("is_boiler"))
    )
    return (
        hashed.join(boiler, ["source", "h"], "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.sum(F.coalesce(F.col("is_boiler"), F.lit(0)))
            .cast("long").alias("n_boiler"),
            F.sum(
                F.when(F.col("is_boiler").isNotNull(), F.col("n_words"))
                .otherwise(0)
            ).cast("long").alias("boiler_words"),
        )
    )


def cdc_chunk_dedup(docs_df, boundary_mod: int = 8,
                    id_col: str = "doc_id",
                    text_col: str = "text"):
    """Content-defined chunking dedup (the FastCDC idea at word
    granularity): chunk boundaries fall AFTER any word whose 64-bit
    hash is 0 mod ``boundary_mod``, so boundaries are a local property
    of the content — inserting a sentence shifts ONE chunk, not every
    downstream chunk the way `chunk_dedup`'s fixed 8-word windows do.
    That shift-robustness is why CDC is the dedup standard for
    near-identical page revisions.

    Per doc: total chunks and chunks whose exact content (md5 of the
    joined words) appears in >= 2 distinct documents. Expected chunk
    length = boundary_mod words; all exact integers.

    Plan: chunk boundaries are a LOCAL property of each document's own
    words, so the chunk hashes are computed per row with array
    higher-order functions (boundary-position filter -> slice -> md5) —
    no word-level explode, no doc-keyed window, no collect_list
    reassembly (the previous shape shuffled the corpus' full word
    stream through a prefix-sum window and rebuilt every chunk from
    sorted structs). The only remaining shuffles are the two the
    contract actually requires: the chunk-hash agg for cross-doc
    counts and the per-doc re-agg. Keys always include the doc id or
    the chunk hash: corpus growth adds reducers, not skew.
    """
    m = int(boundary_mod)
    toks = f"filter(split(trim({text_col}), ' '), t -> t <> '')"
    if 256 % m == 0:
        # mod of a power-of-two divisor of 256 only needs the LOW byte
        # of the little-endian uint64 (hex pair 17) — 2^8 = 0 mod m
        def flag(w: str) -> str:
            return (f"CAST(conv(substring(md5(cast({w} AS binary)), 17, 2), "
                    f"16, 10) AS INT) % {m} = 0")
    else:
        def flag(w: str) -> str:
            rev = "concat(" + ", ".join(
                f"substring(md5(cast({w} AS binary)), {p}, 2)"
                for p in (31, 29, 27, 25, 23, 21, 19, 17)) + ")"
            return f"CAST(conv({rev}, 16, 10) AS DECIMAL(20,0)) % {m} = 0"

    # boundary word positions (1-based); chunk k spans
    # (bp[k-1]+1 .. bp[k]), plus the trailing run after the last
    # boundary (dropped when empty: start > end)
    chunk_hashes = (
        "transform(filter(arrays_zip("
        "  concat(array(1), transform(bp, p -> p + 1)), "
        "  concat(bp, array(size(t)))), x -> x['0'] <= x['1']), "
        "x -> md5(array_join(slice(t, x['0'], x['1'] - x['0'] + 1), ' ')))"
    )
    from ..plans.partitioning import spread

    ch = (
        spread(docs_df.select(F.col(id_col).alias("doc_id"),
                              F.expr(toks).alias("t")))
        .filter(F.size("t") >= 1)
        .select(
            "doc_id", "t",
            F.expr(f"filter(sequence(1, size(t)), "
                   f"i -> {flag('element_at(t, i)')})").alias("bp"),
        )
        .select("doc_id", F.explode(F.expr(chunk_hashes)).alias("h"))
    )
    cross = ch.groupBy("h").agg(
        F.countDistinct("doc_id").alias("nd"))
    return (
        ch.join(cross, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0))
            .cast("long").alias("n_dup_chunks"),
        )
    )


def prefix_jaccard_pairs(docs_df, threshold: float = 0.5, w: int = 3,
                         id_col: str = "doc_id", text_col: str = "text",
                         ds=None):
    """EXACT w-shingle Jaccard pairs via the AllPairs/PPJoin prefix
    filter — the at-scale plan for the `ngram_jaccard_pairs` contract
    (identical output, same oracle).

    The full inverted-index join pays k^2 rows for EVERY shingle shared
    by k docs. The prefix filter pays it only for each doc's RAREST
    shingles: order the universe by (global doc-frequency, shingle)
    ascending and keep each doc's first n - ceil(t*n) + 1 shingles; any
    pair with Jaccard >= t MUST share a prefix shingle (if two sets
    disagree on all of either prefix, the overlap is at most
    n - prefix_len = ceil(t*n) - 1 < t*n <= t*|union| — pigeonhole on
    the common total order), so joining prefixes only is lossless. High-
    frequency boilerplate shingles land at the order's tail and never
    join — the skew k^2 blowup the exact variant documents is cut at
    the source rather than capped. Candidates then pass the size filter
    (min(n_a,n_b) >= t*max — else J < t even at full containment) and
    are verified by an exact intersection count restricted to the
    candidate pair set.

    Per-doc prefix selection is a doc-keyed ARRAY sort (never global:
    each doc's (df, shingle) structs are collected and array_sort-ed
    within one row — no window at all. The per-doc limit
    n - ceil(t*n) + 1 is DYNAMIC, which defeats Spark's
    WindowGroupLimit rewrite, so a window variant pays a full sort of
    the joined inverted index by (doc, df, shingle)). Candidates pass
    the size filter AND the PPJoin positional filter before the
    distinct, then are verified exactly on the skinny (doc, shingle)
    index (an array_intersect verify over per-doc shingle arrays was
    measured SLOWER — it ships both docs' arrays to every pair).
    """
    if ds is None:
        ds = shingle_sets(docs_df, w, id_col, text_col)
    if dict(ds.dtypes).get("shingle") in ("int", "bigint"):
        # dictionary-encoded index (shingle_sid_sets): ids are already
        # dense ranks of the (df, shingle) order, so the per-doc sort
        # IS the rarest-first prefix order — the freq join and the
        # struct sort both disappear.
        arr = (
            ds.groupBy("doc_id")
            .agg(F.array_sort(F.collect_list("shingle")).alias("sh"))
            .select("doc_id", "sh", F.size("sh").alias("n"))
            .localCheckpoint(eager=False)
        )
    else:
        freq = ds.groupBy("shingle").agg(F.count("*").alias("df"))
        arr = (
            ds.join(freq, "shingle")
            .groupBy("doc_id")
            .agg(F.array_sort(
                F.collect_list(F.struct("df", "shingle"))).alias("sarr"))
            .select(
                "doc_id",
                F.expr("transform(sarr, s -> s.shingle)").alias("sh"),
                F.size("sarr").alias("n"),
            )
            .localCheckpoint(eager=False)
        )
    prefix = arr.select(
        "doc_id", "n",
        F.posexplode(F.expr(
            f"slice(sh, 1, CAST(n - ceil({threshold} * n) + 1 AS INT))"
        )).alias("pos", "shingle"),
    )
    pa = prefix.select(F.col("doc_id").alias("id_a"), "shingle",
                       F.col("n").alias("na"), F.col("pos").alias("pa"))
    pb = prefix.select(F.col("doc_id").alias("id_b"), "shingle",
                       F.col("n").alias("nb"), F.col("pos").alias("pb"))
    # PPJoin positional filter (lossless): common shingles of a pair
    # matching at (0-based) prefix positions (pa, pb) all lie at or
    # after those positions in the shared total order, so the overlap
    # is <= min(na - pa, nb - pb); J >= t needs overlap >=
    # alpha = ceil(t/(1+t) * (na+nb)) (i integer). Dropping instances
    # below the bound cannot drop a true pair — the pair's EARLIEST
    # match carries its loosest bound and survives. Cuts candidates
    # 309,803 -> 137,133 at sf0.1 before the distinct + verify.
    alpha = F.ceil(F.lit(threshold / (1.0 + threshold))
                   * (F.col("na") + F.col("nb")))
    cands = (
        pa.join(pb, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.least("na", "nb")
                >= F.lit(threshold) * F.greatest("na", "nb"))
        .filter(F.least(F.col("na") - F.col("pa"),
                        F.col("nb") - F.col("pb")) >= alpha)
        .select("id_a", "id_b", "na", "nb")
        .distinct()
    )
    # verify on the SKINNY inverted index, not the doc arrays: shipping
    # both docs' shingle arrays to every candidate pair moved ~2 orders
    # of magnitude more bytes than the (doc, shingle) rows do (measured
    # slower), while the index join + pair-keyed count stays narrow.
    inter = (
        cands.join(ds.select(F.col("doc_id").alias("id_a"), "shingle"),
                   "id_a")
        .join(ds.select(F.col("doc_id").alias("id_b"), "shingle"),
              ["id_b", "shingle"])
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(F.count("*").alias("i"))
    )
    return (
        inter.withColumn(
            "jaccard",
            F.col("i") * F.lit(1.0) / (F.col("na") + F.col("nb") - F.col("i")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def shingle_containment_pairs(docs_df, thr_num: int = 4, thr_den: int = 5,
                              w: int = 3, id_col: str = "doc_id",
                              text_col: str = "text", ds=None):
    """EXACT shingle-containment pairs — the ASYMMETRIC near-dup
    detector Jaccard misses: a short document pasted into a long one
    has tiny Jaccard (the union is dominated by the long doc) but
    containment |S(A) cap S(B)| / min(|S(A)|, |S(B)|) ~ 1. This is the
    partial-copy / quotation / boilerplate-inclusion case a web-corpus
    dedup pass must catch (Broder's containment measure, the other half
    of the resemblance/containment pair from the original shingling
    paper).

    Same all-JVM inverted-shingle-index plan as ``ngram_jaccard_pairs``
    (split -> shingle explode -> DISTINCT sets -> shingle equi-join ->
    size joins), with the threshold applied as an exact integer
    cross-multiplication: keep pairs with
    inter * thr_den >= thr_num * least(n_a, n_b) — no float division
    anywhere, so both engines agree bit-for-bit. Same skew exposure as
    the Jaccard twin (exactness forbids bucket caps); the LSH variants
    are the scale-out candidate tier.

    Returns (id_a, id_b, i, n_a, n_b): id_a < id_b, i = shared
    distinct shingles, n_* = distinct-shingle set sizes.
    """
    if ds is None:
        ds = shingle_sets(docs_df, w, id_col, text_col)
    sizes = ds.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (
        ds.select(F.col("doc_id").alias("id_a"), "shingle")
        .join(ds.select(F.col("doc_id").alias("id_b"), "shingle"),
              "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("i"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("id_a"),
                                F.col("n").alias("n_a")), "id_a")
        .join(sizes.select(F.col("doc_id").alias("id_b"),
                           F.col("n").alias("n_b")), "id_b")
        .filter(
            F.col("i") * int(thr_den)
            >= int(thr_num) * F.least("n_a", "n_b"))
        .select("id_a", "id_b", "i",
                F.col("n_a").cast("long").alias("n_a"),
                F.col("n_b").cast("long").alias("n_b"))
    )
