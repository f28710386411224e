"""Deduplication operators for large-scale document pipelines.

All hashing is md5-derived (:func:`hash60`) so results are reproducible in
any engine (the DuckDB oracles use the same construction) — Spark's murmur
``F.hash`` has no cross-engine twin.

Scale design notes:

- ``exact_dedup``: one hash-shuffle on the content hash; linear.
- ``token_jaccard_pairs``: exact set-similarity self-join with *prefix
  filtering* (Chaudhuri et al.'s SSJoin / Bayardo et al.'s All-Pairs): a pair
  with Jaccard >= t must share at least one token among the first
  ``L - ceil(t*L) + 1`` of each document's tokens when ordered rarest-first.
  Only prefix tokens enter the self-join, which collapses the quadratic
  blowup from ubiquitous tokens (the naive inverted-index join is kept as the
  test oracle). Verification is exact via ``array_intersect`` on the full
  token sets.
- ``minhash_signatures`` / ``minhash_lsh_pairs``: banded MinHash-LSH
  candidate generation, verified with exact Jaccard — the sub-quadratic path
  when even prefix filtering is too dense.
- ``simhash``: 60-bit SimHash per document for Hamming-distance near-dup.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, Window, functions as F

from foresttime_builder_spark.operators.cache import release_on_gc as _release_on_gc
from foresttime_builder_spark.operators.spread import spread as _sp


def hash60(col: Column | str) -> Column:
    """First 15 hex digits of md5 as a non-negative 60-bit bigint.

    DuckDB twin: ``CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def tokens(text: Column | str, distinct: bool = True) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    arr = F.split(c, " ")
    return F.array_distinct(arr) if distinct else arr


def char_ngrams(text: str, n: int = 3) -> Column:
    """Distinct character n-gram (shingle) set of a text column — the
    n-gram flavor of set-similarity dedup (vs whitespace tokens). SQL-text
    construction: one JVM round trip, and `sequence` is guarded because
    Spark's sequence(1, 0) yields a DESCENDING [1, 0], not empty."""
    return F.expr(
        f"CASE WHEN length(`{text}`) < {n} THEN array() "
        f"ELSE array_distinct(transform(sequence(1, length(`{text}`) - {n - 1}), "
        f"i -> substring(`{text}`, i, {n}))) END"
    )


def exact_dedup(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """Group identical content; emit (content_hash, keep_id, n_copies)."""
    return df.groupBy(F.md5(F.col(content_col)).alias("content_hash")).agg(
        F.min(id_col).alias(f"keep_{id_col}"),
        F.count(F.lit(1)).alias("n_copies"),
    )


def derive_candidate_budget(
    spark,
    safety: float = 0.25,
    bytes_per_candidate: int = 64,
    n_workers: int = 1,
) -> int:
    """Conservative default for ``candidate_budget`` derived from the
    machine the shuffle will actually spill to.

    The guarded family (:func:`token_jaccard_pairs`,
    ``graph.cluster_near_dups``) treats ``candidate_budget=None`` as
    unguarded — correct for tests, a foot-gun in production where a dense
    corpus can project a candidate stream that exceeds local shuffle
    storage.  This helper turns the guard default-safe with one line::

        pairs = token_jaccard_pairs(
            df, "doc_id", "text",
            candidate_budget=derive_candidate_budget(spark),
            on_budget="degrade",
        )

    Derivation: free bytes across the distinct ``spark.local.dir``
    shuffle directories × ``safety`` ÷ ``bytes_per_candidate`` (two ids +
    overlap counters + shuffle framing ≈ 64 B/candidate both in flight
    and on disk).  ``safety`` defaults to 0.25 so the candidate shuffle
    claims at most a quarter of the free spill space — the verification
    join and whatever else the job runs need the rest.

    On a real cluster the driver cannot see executor disks: pass
    ``n_workers`` (budget scales linearly — each executor spills its own
    partitions) and point ``spark.local.dir`` at a path with
    representative free space, or skip the helper and pass an explicit
    figure from your infrastructure.  Floors at 1M candidates so a nearly
    full dev disk still lets small corpora through (1M candidates is
    ≤64 MB — noise even on a laptop).
    """
    import shutil

    conf_dirs = spark.conf.get(
        "spark.local.dir", os.environ.get("SPARK_LOCAL_DIRS", "/tmp")
    )
    free = 0
    seen = set()
    for d in conf_dirs.split(","):
        d = d.strip() or "/tmp"
        try:
            # count each filesystem once even if several dirs share it —
            # keyed by device id, not by (total, free), which can both
            # collapse distinct same-sized idle disks and double-count one
            # filesystem whose free bytes moved between the two stat calls
            key = os.stat(d).st_dev
            usage = shutil.disk_usage(d)
        except OSError:
            continue
        if key in seen:
            continue
        seen.add(key)
        free += usage.free
    budget = int(free * safety / bytes_per_candidate) * max(n_workers, 1)
    return max(budget, 1_000_000)


def estimate_candidate_pairs(
    docsets: DataFrame, threshold: float, sample_docs: int = 20_000,
    prefix: bool = True,
) -> int:
    """Projected pre-``distinct`` candidate volume of the exact self-join,
    from a bounded document sample.

    The quantity that bounds the exact path's feasibility is the candidate
    *stream* the join shuffles — ``sum over joined tokens of
    C(df_token, 2)`` — not the verified output (at sf10 this stream hit
    ~1.25e9 rows and exceeded local disk while the gate-visible output was
    tiny).  With ``prefix=True`` the estimator replays the actual prefix
    selection (rarest-first rank, length-dependent prefix) on a uniform doc
    sample of rate ``p``; with ``prefix=False`` (the ``naive``
    inverted-index join, which has no prefix cut) it sums ``C(df, 2)`` over
    EVERY token — the true naive stream, which can be far larger than the
    prefix projection.  Either way the summed per-token pair counts scale
    by ``1/p^2``: per-token document frequency scales ~``p`` under uniform
    doc sampling, so ``C(p*df, 2) ~ p^2 * C(df, 2)``.  One small job over
    ~``sample_docs`` documents; no full-corpus shuffle.
    """
    n_docs = docsets.count()  # cheap: docsets is persisted by the caller
    if n_docs == 0:
        return 0
    if n_docs <= sample_docs:
        sample, p = docsets, 1.0
    else:
        p = sample_docs / n_docs
        sample = docsets.sample(fraction=p, seed=7)
    tok = sample.select("doc_id", "sz", F.explode("toks").alias("token"))
    if prefix:
        dfreq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
        tok = (
            tok.join(F.broadcast(dfreq), "token")
            .withColumn(
                "rnk",
                F.row_number().over(
                    Window.partitionBy("doc_id").orderBy("df", "token")
                ),
            )
            .filter(_prefix_len_ok(F.col("rnk"), F.col("sz"), threshold))
        )
    row = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .agg(F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("pairs"))
        .collect()[0]
    )
    sampled_pairs = float(row["pairs"] or 0.0)
    return int(sampled_pairs / (p * p))


def estimate_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int,
    band_size: int,
    tokenizer: Column | None = None,
    sample_docs: int = 20_000,
) -> int:
    """Projected pre-``distinct`` candidate volume of the banded-LSH
    self-join (:func:`minhash_lsh_pairs`), from a bounded document sample.

    The LSH join's shuffle is ``sum over (band, band_key) buckets of
    C(n_bucket, 2)`` — on a heavily self-similar corpus near-dup pairs
    collide in MOST bands, so the stream approaches
    ``n_bands × true_pairs`` and can exceed local disk even though
    banding is "sub-quadratic" (measured: the unguarded q23 at sf10 died
    at 176 s — ~7e9 projected candidates vs 74 GB of shuffle disk).
    Bucket sizes scale ~``p`` under uniform doc sampling, so the per-
    bucket pair sums scale by ``1/p^2`` exactly like
    :func:`estimate_candidate_pairs`.

    Since r14's in-join All-Pairs length cut this is a CONSERVATIVE upper
    bound (it sums C(n, 2) per bucket without the size-compatibility
    predicate) — the same posture as the prefix estimator, which also
    projects its stream without the r13 length cut.  Upper bound is the
    right direction for a feasibility guard, and on near-dup corpora the
    cut prunes little anyway (true near-dups are size-compatible by
    definition), so the bound stays tight where it matters."""
    n_docs = df.count()
    if n_docs == 0:
        return 0
    if n_docs <= sample_docs:
        sample, p = df, 1.0
    else:
        p = sample_docs / n_docs
        sample = df.sample(fraction=p, seed=7)
    stacked = _stacked_bands(
        sample, id_col, text_col, n_hashes, band_size, tokenizer=tokenizer
    )
    row = (
        stacked.groupBy("band_key")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("pairs"))
        .collect()[0]
    )
    return int(float(row["pairs"] or 0.0) / (p * p))


def estimate_containment_candidates(
    docsets: DataFrame, threshold: float, sample_docs: int = 20_000
) -> int:
    """Projected pre-``distinct`` candidate volume of the containment
    prefix⋈index join (:func:`containment_pairs`): ``sum over tokens of
    prefix_df(token) × (df(token) - 1)`` — each prefix posting joins every
    OTHER posting of that token in the full inverted index.  Replays the
    containment prefix formula on a uniform doc sample; both factors
    scale ~``p``, so the sum scales by ``1/p^2``."""
    n_docs = docsets.count()
    if n_docs == 0:
        return 0
    if n_docs <= sample_docs:
        sample, p = docsets, 1.0
    else:
        p = sample_docs / n_docs
        sample = docsets.sample(fraction=p, seed=7)
    tok = sample.select("doc_id", "sz", F.explode("toks").alias("token"))
    dfreq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    pref = (
        tok.join(F.broadcast(dfreq), "token")
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("df", "token")
            ),
        )
        .filter(
            F.col("rnk")
            <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("pdf"))
    )
    row = (
        pref.join(dfreq, "token")
        .agg(F.sum(F.col("pdf") * (F.col("df") - 1)).alias("pairs"))
        .collect()[0]
    )
    return int(float(row["pairs"] or 0.0) / (p * p))


def token_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    strategy: str = "auto",
    tokenizer: Column | None = None,
    candidate_budget: int | None = None,
    on_budget: str = "error",
    degrade_budget: int | None = None,
) -> DataFrame:
    """All pairs of documents with token-set Jaccard >= threshold (exact).

    Returns columns (doc_a, doc_b, n_common, jaccard) with doc_a < doc_b and
    jaccard rounded to 4 decimals.

    Strategies (all lossless — they produce identical results):

    - ``bitmask``: for small vocabularies (<= 64 distinct tokens): encode
      each document's token set as one 64-bit mask, collapse documents with
      identical sets, compare *distinct sets* pairwise with popcount
      arithmetic, then expand back to document pairs. The pairwise
      comparison is a broadcast nested-loop self-join on the distinct-set
      table — tiny vocabularies collapse billions of documents into at most
      ``2^V`` (in practice ~thousands of) distinct sets.
    - ``prefix``: general vocabularies: All-Pairs/SSJoin prefix filtering —
      only each document's ``L - ceil(t*L) + 1`` globally-rarest tokens
      enter the self-join; exact verification via ``array_intersect``.
      Correct at any vocabulary size; efficient when token document
      frequencies are small relative to the corpus (real text).
    - ``naive``: full inverted-index self-join (the test oracle's shape).
    - ``auto``: ``bitmask`` if the vocabulary fits in 64 bits else
      ``prefix``.  Decided from a bounded document sample first: a sample
      vocabulary > 64 already *proves* the full vocabulary is > 64 (sample
      ⊆ corpus), so the common big-corpus case is settled by scanning a few
      thousand docs — no full-corpus pass.  Only when the sample stays ≤ 64
      (plausibly tiny vocabulary) does an exact full count confirm, and the
      bitmask path would immediately rescan the corpus anyway.  Callers that
      know their corpus should pass the strategy explicitly.

    ``candidate_budget`` is the regime guard for the exact path: before
    any full-corpus shuffle, :func:`estimate_candidate_pairs` projects the
    prefix join's candidate stream from a doc sample; if the projection
    exceeds the budget the operator either raises with actionable advice
    (``on_budget='error'``) or degrades to banded MinHash-LSH candidates
    with the same exact verification and output schema
    (``on_budget='degrade'``: high recall instead of guaranteed-total
    recall — the production posture once exact pairs are physically
    output-bound; banding ``n_hashes=16, band_size=4`` centers the
    collision s-curve near ``(1/4)^(1/4) ~ 0.71``, matched to the default
    0.8 threshold).  The guard never fires for ``bitmask`` (candidates are
    bounded by distinct token-SETS squared, not documents).

    The fallback is guarded too: the banded stream can itself be
    output-bound on a self-similar corpus (q23 at sf10 projected ~2.3e9
    banded candidates), so the degrade call inherits ``candidate_budget``
    and raises the designed feasibility error rather than re-entering an
    unguarded self-join.  When the caller's budget is a deliberate
    forcing lever rather than a physical limit (demos, tests), pass
    ``degrade_budget`` — the fallback is then guarded by THAT figure
    (e.g. ``derive_candidate_budget(spark)``) instead.
    """
    if on_budget not in ("error", "degrade"):
        raise ValueError(f"bad on_budget {on_budget!r}")
    # the tokenized relation feeds the candidate join AND both verification
    # sides — persist it so the corpus is tokenized once, not 3-4 times
    # (the standard SSJoin practice of materializing the token relation)
    # tokenizer defaults to whitespace tokens; pass e.g. char_ngrams(text_col)
    # for shingle-based (n-gram) set similarity — everything downstream
    # (prefix filter, bitmask, verification) is tokenization-agnostic
    tok_col = tokens(text_col) if tokenizer is None else tokenizer
    docsets = (
        df.select(F.col(id_col).alias("doc_id"), tok_col.alias("toks"))
        .withColumn("sz", F.size("toks"))
        .persist()
    )

    # ONE sample-first vocabulary probe (<= 2 bounded jobs) settles the
    # auto strategy AND hands the mask/int tiers their position
    # assignment — the r16 probe collapse (see _vocab_if_small); pinned
    # strategies probe lazily below so they pay nothing extra.
    small_vocab: list[str] | None = None
    vocab_probed = False
    if strategy == "auto":
        small_vocab = _vocab_if_small(docsets, _BLOCKMASK_VOCAB_CAP)
        vocab_probed = True
        strategy = (
            "bitmask"
            if small_vocab is not None and len(small_vocab) <= 64
            else "prefix"
        )

    if candidate_budget is not None and strategy in ("prefix", "naive"):
        # the naive inverted-index join has no prefix cut, so its stream is
        # the full per-token C(df,2) sum — project that, not the (much
        # smaller) prefix replay
        projected = estimate_candidate_pairs(
            docsets, threshold, prefix=(strategy == "prefix")
        )
        if projected > candidate_budget:
            docsets.unpersist()
            if on_budget == "error":
                raise ValueError(
                    f"token_jaccard_pairs: projected candidate stream "
                    f"~{projected:,} pairs exceeds candidate_budget="
                    f"{candidate_budget:,}; the exact all-pairs answer is "
                    f"shuffle/output-bound in this regime. Re-run with "
                    f"on_budget='degrade' (banded MinHash-LSH candidates, "
                    f"exact verification, same schema), or use "
                    f"minhash_lsh_pairs / dup_clusters directly."
                )
            # forward a budget: on a corpus dense enough that the BANDED
            # stream is itself output-bound (the q23 sf10 regime, ~2.3e9
            # banded candidates), an unguarded degrade re-enters the exact
            # failure the guard exists to prevent — the fallback must raise
            # the designed feasibility error, not exhaust shuffle disk.
            # The forwarded budget is RESCALED ×4: candidate budgets are
            # denominated in ~64 B exact-path verification rows
            # (derive_candidate_budget's default), while banded candidate
            # rows are two 8-byte ids (~16 B framed) — the same spill disk
            # affords 4× the candidates.  Without the rescale the
            # r11-complete sf10 regime (q16/q50/q77: ~4.5e8 banded
            # candidates ≈ 7 GB) spuriously raises — the r12 sweep caught
            # exactly that regression; with it, the q23 regime (~2.3e9
            # banded ≈ past the scaled budget) still raises as designed.
            # degrade_budget overrides when candidate_budget is a forcing
            # lever rather than a physical limit.
            return minhash_lsh_pairs(
                df, id_col, text_col, n_hashes=16, band_size=4,
                threshold=threshold, tokenizer=tokenizer,
                candidate_budget=(
                    candidate_budget * 4 if degrade_budget is None
                    else degrade_budget
                ),
            )

    if strategy == "bitmask":
        return _release_on_gc(
            _jaccard_bitmask(docsets, threshold, vocab=small_vocab), docsets
        )

    if strategy == "prefix":
        # vocabulary-adaptive verification: when the vocabulary fits a
        # fixed budget of 64-bit words (<= _BLOCKMASK_VOCAB_CAP tokens),
        # verify candidates with popcount arithmetic over long arrays
        # instead of merging string arrays — exact (explicit bit positions,
        # no hashing), JVM-side, and ~10x cheaper per pair.  The sf1 sweep
        # showed verification dominating the prefix path (48 of 65 s on
        # 122M candidates) precisely in the small-vocabulary regime where
        # this representation applies.
        if not vocab_probed:
            small_vocab = _vocab_if_small(docsets, _BLOCKMASK_VOCAB_CAP)
        if small_vocab:
            return _release_on_gc(
                _jaccard_prefix_blockmask(docsets, threshold, small_vocab),
                docsets,
            )
        tok = docsets.select("doc_id", "sz", F.explode("toks").alias("token"))
        # rarest-first global order; ties broken by token text for determinism
        dfreq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
        ranked = (
            tok.join(F.broadcast(dfreq), "token")
            .withColumn(
                "rnk",
                F.row_number().over(
                    Window.partitionBy("doc_id").orderBy("df", "token")
                ),
            )
            # prefix length L - ceil(t_eff*L) + 1 (slacked; see helper)
            .filter(_prefix_len_ok(F.col("rnk"), F.col("sz"), threshold))
            .select("doc_id", "token", "sz", "rnk")
        )
        a, b = ranked.alias("a"), ranked.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.token") == F.col("b.token"))
                & (F.col("a.doc_id") < F.col("b.doc_id"))
                & _size_compatible(F.col("a.sz"), F.col("b.sz"), threshold)
                & _positional_bound_ok(
                    F.col("a.rnk"), F.col("b.rnk"),
                    F.col("a.sz"), F.col("b.sz"), threshold,
                ),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
            )
            .distinct()
        )
    elif strategy == "naive":
        tok = docsets.select("doc_id", F.explode("toks").alias("token"))
        a, b = tok.alias("a"), tok.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.token") == F.col("b.token"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
            )
            .distinct()
        )
    else:
        raise ValueError(f"bad strategy {strategy!r}")

    sa = docsets.select(
        F.col("doc_id").alias("doc_a"), F.col("toks").alias("toks_a"), F.col("sz").alias("sz_a")
    )
    sb = docsets.select(
        F.col("doc_id").alias("doc_b"), F.col("toks").alias("toks_b"), F.col("sz").alias("sz_b")
    )
    verified = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        # lossless length cut before the set intersection (All-Pairs bound;
        # already enforced inside the prefix join — kept here so the naive
        # strategy and any future candidate source verify identically)
        .filter(_size_compatible(F.col("sz_a"), F.col("sz_b"), threshold))
        .withColumn("n_common", F.size(F.array_intersect("toks_a", "toks_b")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return _release_on_gc(
        verified.select("doc_a", "doc_b", "n_common", "jaccard"), docsets
    )


def _full_vocab_if_small(docsets: DataFrame, cap: int) -> list[str] | None:
    """The full corpus vocabulary, sorted, if <= ``cap`` distinct tokens,
    else None — ONE bounded ``limit(cap+1)`` collect (no full-corpus
    distinct-count job; the collected values are the position assignment
    the mask/int tiers need, so callers run no further vocabulary jobs)."""
    rows = (
        docsets.select(F.explode("toks").alias("token"))
        .distinct()
        .limit(cap + 1)
        .collect()
    )
    if len(rows) > cap:
        return None
    return sorted(r["token"] for r in rows)


def _vocab_if_small(
    docsets: DataFrame, cap: int, sample_docs: int = 4096
) -> list[str] | None:
    """Sample-first vocabulary probe: the sorted vocabulary if <= ``cap``
    distinct tokens, else None, in at most TWO bounded jobs.

    Stage 1 counts distinct tokens in a bounded ``limit(sample_docs)``
    sample — on any real text corpus this exceeds the cap within the
    first few documents and the answer is certain (sample vocabulary is
    a lower bound on corpus vocabulary), costing a scan of a handful of
    input splits instead of a full-corpus explode+distinct shuffle.
    Stage 2 (reached only for genuinely small-vocabulary corpora)
    confirms with one bounded ``limit(cap+1)`` COLLECT whose values
    settle every downstream question at once — fits-64?, fits-cap?, and
    the mask/int position assignment itself.

    r16 probe collapse (guide §2.6 / r15 verdict item 4): the former
    ladder ran up to FIVE serial bounded jobs ahead of a q16-family
    query's real work (sample count + full count for the 64-bit mask
    question, the same pair again for the blockmask cap, then a separate
    ``_vocab_positions`` limit-collect once a mask tier was chosen);
    collecting values instead of counting them folds all of those into
    the same two jobs."""
    sample_vocab = (
        docsets.limit(sample_docs)
        .select(F.explode("toks").alias("token"))
        .distinct()
        .limit(cap + 1)
        .count()
    )
    if sample_vocab > cap:
        return None
    return _full_vocab_if_small(docsets, cap)


def _vocab_positions(
    docsets: DataFrame, cap: int, err: str, vocab: list[str] | None = None
) -> tuple[DataFrame, int]:
    """``((token, pos) frame, vocab size)`` with positions assigned
    lexicographically — the shared vocabulary-numbering step of the
    bitmask/blockmask/int-array paths.

    ``vocab`` short-circuits the collect when a caller already probed the
    vocabulary (r16 probe collapse — the auto strategies pass their probe
    result through, so the numbering costs ZERO extra jobs).  Without it,
    one bounded ``limit(cap+1)`` driver collect + a Python sort — same
    result as a global ``row_number`` window, no single-partition
    WindowExec (whose expected warning drowned real warnings in the gate
    logs).  A pinned strategy on a corpus that outgrew the cap
    (precondition violated) raises ``err`` here, at plan time, instead of
    mid-execution."""
    if vocab is None:
        vocab = _full_vocab_if_small(docsets, cap)
    if vocab is None or len(vocab) > cap:
        raise ValueError(err)
    return (
        docsets.sparkSession.createDataFrame(
            [(t, i) for i, t in enumerate(vocab)], "token string, pos int"
        ),
        len(vocab),
    )


_BLOCKMASK_VOCAB_CAP = 4096  # 64 longs of bitset per document

#: int-array tier cap (r16): unlike the blockmask, the int tier's per-pair
#: cost is O(sz) regardless of vocabulary width, so its only bound is the
#: driver-collect + broadcast of the position dictionary — 64k tokens is a
#: ~2 MB broadcast.  Real open-vocabulary corpora blow past this within
#: one sample probe (answer settles with no full-corpus pass); bounded
#: synthetic/categorical vocabularies stay inside and verify on ints.
_INTARRAYS_VOCAB_CAP = 65536


def _prefix_len_ok(rnk: Column, sz: Column, threshold: float) -> Column:
    """All-Pairs prefix-membership predicate: token rank within
    ``L - ceil(t_eff * L) + 1``.  Uses the SLACKED threshold
    ``t_eff = t - 1e-4`` like every other filter in the family — the
    final filter admits raw jaccard down to ``t - 5e-5`` (4-dp HALF_UP),
    so a prefix computed from the exact ``t`` is one token too short
    precisely when ``t*L`` sits within ``1e-4*L`` above an integer
    (possible at ~1e4+-token documents), silently dropping a pair the
    rounding contract admits (r15 review catch — pre-existing since the
    r13 prefix join).  Cost: prefixes grow by at most one token."""
    t_eff = threshold - 1e-4
    return rnk <= sz - F.ceil(F.lit(t_eff) * sz) + 1


def _size_compatible(sz_a: Column, sz_b: Column, threshold: float) -> Column:
    """All-Pairs/SSJoin length filter: ``jaccard(A,B) <= min(|A|,|B|) /
    max(|A|,|B|)`` (the intersection is at most the smaller set), so a
    pair whose token-count ratio is below the threshold cannot reach the
    output — a LOSSLESS pre-filter evaluated inside the prefix join, two
    integer comparisons per candidate, pruning before the distinct and
    the array/bitset verification (r12 verdict item: the pair family's
    remaining headroom).  The 1e-4 slack covers the 4-dp output rounding:
    the final filter is on round4(jaccard) >= t, which admits raw jaccard
    down to t - 5e-5."""
    return F.least(sz_a, sz_b) >= (
        F.lit(threshold) - F.lit(1e-4)
    ) * F.greatest(sz_a, sz_b)


def _positional_bound_ok(
    rnk_a: Column, rnk_b: Column, sz_a: Column, sz_b: Column, threshold: float
) -> Column:
    """PPJoin-style positional filter (Xiao et al., "Efficient Similarity
    Joins for Near Duplicate Detection" — the same public-literature family
    as the All-Pairs length cut above), evaluated per matched prefix token
    INSIDE the candidate join, before the ``distinct`` shuffle and the
    array/bitset verification.

    For a candidate generated by a shared token at per-document ranks
    ``(i, j)`` under one consistent global order (rarest-first ``(df,
    token)`` — so any common token sits on the same side of the match in
    BOTH documents), the overlap decomposes into common-before plus
    common-from-the-match-on::

        overlap <= min(i-1, j-1)  +  1 + min(sz_a - i, sz_b - j)

    Jaccard >= t requires ``overlap >= t/(1+t) * (sz_a + sz_b)``; a row
    whose bound cannot reach that is discarded.  LOSSLESS per row (not
    just per pair): a truly-similar pair satisfies the bound at EVERY
    shared token, so each of its join rows survives and the pair cannot
    be lost — no ordering or first-match bookkeeping needed, which is
    what makes the filter expressible as a pure join predicate Catalyst
    evaluates before the exchange.  The threshold carries the same 1e-4
    rounding slack as :func:`_size_compatible` (final filter admits raw
    jaccard down to ``t - 5e-5``) plus 1e-9 float headroom, so boundary
    pairs are kept, never dropped."""
    t = threshold - 1e-4
    ubound = (
        F.least(rnk_a, rnk_b)
        + F.least(sz_a - rnk_a, sz_b - rnk_b)
    )
    return ubound >= F.lit(t / (1.0 + t)) * (sz_a + sz_b) - F.lit(1e-9)


def _jaccard_prefix_blockmask(
    docsets: DataFrame, threshold: float, vocab: list[str]
) -> DataFrame:
    """Prefix-filtered candidates + popcount verification over multi-word
    bitsets, for vocabularies of up to ``_BLOCKMASK_VOCAB_CAP`` tokens
    (``vocab`` is the caller's probe result — no further vocabulary jobs).

    Identical results to the string path: the prefix filter is lossless
    under any consistent token order (here (df, pos), which sorts the same
    as (df, token) because positions are assigned in token order), and the
    bitset intersection counts exactly the common tokens — positions are
    explicit per token, no hashing, so there is nothing to collide.
    Candidates join on int positions (8-byte shuffle keys vs strings)."""
    vocab_n = len(vocab)
    n_words = (vocab_n + 63) // 64
    tok = docsets.select("doc_id", "sz", F.explode("toks").alias("token"))
    vocab_df, _ = _vocab_positions(
        docsets,
        _BLOCKMASK_VOCAB_CAP,
        f"blockmask verification requires vocabulary <= "
        f"{_BLOCKMASK_VOCAB_CAP} distinct tokens",
        vocab=vocab,
    )
    tokp = tok.join(F.broadcast(vocab_df), "token").select(
        "doc_id", "sz", "pos"
    )
    dfreq = tokp.groupBy("pos").agg(F.count(F.lit(1)).alias("df"))
    ranked = (
        tokp.join(F.broadcast(dfreq), "pos")
        .withColumn(
            "rnk",
            F.row_number().over(Window.partitionBy("doc_id").orderBy("df", "pos")),
        )
        .filter(_prefix_len_ok(F.col("rnk"), F.col("sz"), threshold))
        .select("doc_id", "pos", "sz", "rnk")
    )
    a, b = ranked.alias("a"), ranked.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.pos") == F.col("b.pos"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & _size_compatible(F.col("a.sz"), F.col("b.sz"), threshold)
            # the (df, pos) ranking orders identically to the string path's
            # (df, token) — positions are assigned in token order — so the
            # positional bound is the same lossless predicate here
            & _positional_bound_ok(
                F.col("a.rnk"), F.col("b.rnk"),
                F.col("a.sz"), F.col("b.sz"), threshold,
            ),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    masks = _blockmasks_from_tokp(tokp, n_words)
    # size cut already enforced inside the candidate join above
    return _blockmask_pair_jaccard(
        cand, masks, threshold, size_cut=False, n_words=n_words
    )


def _blockmask_pair_jaccard(
    cand: DataFrame, masks: DataFrame, threshold: float, size_cut: bool,
    n_words: int,
) -> DataFrame:
    """Popcount pair verification over ``(doc_id, sz, mask)`` bitsets —
    the shared final stage of the prefix blockmask path and the blockmask
    tier of :func:`_verify_candidates` (one definition, so the jaccard
    fixed-point/rounding contract cannot diverge between candidate
    sources — the module convention).  ``size_cut`` re-applies the
    All-Pairs length filter for candidate sources that did not already
    enforce it inside their join.

    The intersection popcount is the ``zip_with``/``aggregate`` HOF fold
    — measured DECISIVELY faster than a flat plan-time-unrolled
    ``F.get(mask, w)`` sum, contrary to the interpreted-lambda-overhead
    hypothesis an r15 experiment tested: q54 sf1 (30 mask words, same
    JVM, interleaved) ran 36.3 s HOF vs 116.4 s unrolled — N independent
    ``get`` expressions re-traverse the join-produced arrays where the
    fold makes one pass, a 3x loss that a fresh-JVM isolate first
    surfaced as a sweep regression.  ``n_words`` stays in the signature
    only as documentation of the caller's width-based blockmask-vs-arrays
    gate (see :func:`_verify_candidates`)."""
    del n_words  # width decisions happen in the caller
    ma = masks.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sz").alias("sz_a"),
        F.col("mask").alias("mask_a"),
    )
    mb = masks.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sz").alias("sz_b"),
        F.col("mask").alias("mask_b"),
    )
    inter = F.aggregate(
        F.zip_with("mask_a", "mask_b", lambda x, y: F.bit_count(x.bitwiseAND(y))),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    out = cand.join(ma, "doc_a").join(mb, "doc_b")
    if size_cut:
        out = out.filter(
            _size_compatible(F.col("sz_a"), F.col("sz_b"), threshold)
        )
    return (
        out.withColumn("n_common", inter.cast("int"))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "jaccard")
    )


def _intset_pair_jaccard(
    cand: DataFrame, intsets: DataFrame, threshold: float, size_cut: bool
) -> DataFrame:
    """``array_intersect`` pair verification over ``(doc_id, sz, ipos)``
    int-position sets — the r16 int-array verification tier (the r15
    BASELINE's named candidate for the wide-vocabulary regime where the
    blockmask is wider than the token array it replaces).

    Exact like the blockmask: positions are assigned bijectively per
    distinct token (:func:`_vocab_positions` — explicit, no hashing), so
    ``|A ∩ B|`` over position arrays equals the token-set intersection
    count.  Per pair the intersection hashes ``~sz`` 4-byte ints instead
    of ``~sz`` strings (arrays tier) or folding ``n_words`` longs
    (blockmask tier) — it costs O(sz) regardless of vocabulary width, so
    it has no wide-mask failure mode, and the verification joins shuffle
    int arrays (~4 B/token) instead of token strings (~10+ B/token).
    Same jaccard fixed-point/rounding contract as every other tier (the
    module convention)."""
    ia = intsets.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sz").alias("sz_a"),
        F.col("ipos").alias("ipos_a"),
    )
    ib = intsets.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sz").alias("sz_b"),
        F.col("ipos").alias("ipos_b"),
    )
    out = cand.join(ia, "doc_a").join(ib, "doc_b")
    if size_cut:
        out = out.filter(
            _size_compatible(F.col("sz_a"), F.col("sz_b"), threshold)
        )
    return (
        out.withColumn(
            "n_common", F.size(F.array_intersect("ipos_a", "ipos_b"))
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "jaccard")
    )


def _intsets_from_tokp(tokp: DataFrame) -> DataFrame:
    """``(doc_id, sz, ipos)`` int-position sets from a ``(doc_id, sz,
    pos)`` token-position relation — the int-array sibling of
    :func:`_blockmasks_from_tokp` (same input relation, so a candidate
    source that already built ``tokp`` can feed either tier)."""
    return tokp.groupBy("doc_id", "sz").agg(
        F.collect_list("pos").alias("ipos")
    )


def _blockmasks_from_tokp(tokp: DataFrame, n_words: int) -> DataFrame:
    """``(doc_id, sz, mask)`` multi-word bitsets from a ``(doc_id, sz,
    pos)`` token-position relation — the shared mask-building stage of
    :func:`_jaccard_prefix_blockmask` and the blockmask verification tier
    of :func:`_verify_candidates` (one definition, so the bit layout
    cannot diverge between candidate sources).  Per-doc bitset: one
    conditional sum per 64-bit word (sum == OR for the distinct positions
    of one document's token set)."""
    word_aggs = [
        F.sum(
            F.when(
                (F.col("pos") >= 64 * w) & (F.col("pos") < 64 * (w + 1)),
                F.expr("shiftleft(CAST(1 AS BIGINT), pos % 64)"),
            ).otherwise(F.lit(0).cast("long"))
        ).alias(f"_w{w}")
        for w in range(n_words)
    ]
    return (
        tokp.groupBy("doc_id", "sz")
        .agg(*word_aggs)
        .select(
            "doc_id", "sz",
            F.array(*[f"_w{w}" for w in range(n_words)]).alias("mask"),
        )
    )


def _doc_masks(
    docsets: DataFrame, vocab: list[str] | None = None
) -> DataFrame:
    """(doc_id, mask): each document's token set as one 64-bit bitmask.

    Only valid when the corpus vocabulary has <= 64 distinct tokens
    (enforced at plan time by :func:`_vocab_positions` — a pinned bitmask
    strategy on a corpus that outgrew 64 tokens raises rather than letting
    ``shiftleft`` wrap pos & 63 into silently-colliding bit positions);
    positions are assigned lexicographically for determinism.  ``vocab``
    short-circuits the vocabulary collect when the caller already probed
    it (r16 probe collapse).
    """
    tok = docsets.select("doc_id", F.explode("toks").alias("token"))
    vocab_df, _ = _vocab_positions(
        docsets,
        64,
        "bitmask dedup requires vocabulary <= 64 distinct tokens; "
        "use strategy=prefix or auto",
        vocab=vocab,
    )
    return (
        tok.join(F.broadcast(vocab_df), "token")
        .groupBy("doc_id")
        # arithmetic sum == bitwise OR for distinct bit positions (the sign
        # bit for pos 63 wraps but stays a valid mask in two's complement)
        .agg(F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), pos)")).alias("mask"))
    )


def _jaccard_bitmask(
    docsets: DataFrame, threshold: float, vocab: list[str] | None = None
) -> DataFrame:
    """Exact Jaccard pairs for vocabularies that fit one 64-bit mask.

    docsets: (doc_id, toks array, sz). See :func:`token_jaccard_pairs`;
    ``vocab`` is the auto strategy's probe result (r16 probe collapse).
    """
    # feeds both sides of the identical-set join AND the distinct-set roll-up:
    # persist, or the explode+shuffle mask build runs three times
    masks = _doc_masks(docsets, vocab=vocab).persist()

    # identical-set pairs: join on equal mask (Jaccard exactly 1)
    ma, mb = masks.alias("a"), masks.alias("b")
    intra = (
        ma.join(
            mb,
            (F.col("a.mask") == F.col("b.mask"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.mask")).cast("int").alias("n_common"),
            F.lit(1.0).alias("jaccard"),
        )
    )

    # distinct-set pairwise comparison, then expand each qualifying set pair
    # back to its documents.  A naive all-pairs nested loop is |sets|²; the
    # SSJoin size filter makes it a hash equi-join instead: J >= t forces
    # t·|A| <= |B| <= |A|/t, so explode each set over its admissible
    # popcount window and join on exact popcount.  The epsilon only widens
    # the window (extra candidates are removed by the exact jaccard filter
    # below), guarding against float fuzz like 0.8*15 = 12.0000000000000007.
    sets = masks.groupBy("mask").agg(F.collect_list("doc_id").alias("members"))
    pcs = sets.withColumn("pc", F.bit_count("mask").cast("int"))
    lo = F.ceil(F.lit(threshold) * F.col("pc") - F.lit(1e-9)).cast("int")
    hi = F.floor(F.col("pc") / F.lit(threshold) + F.lit(1e-9)).cast("int")
    sa = pcs.withColumn("pc_b", F.explode(F.sequence(lo, hi))).alias("sa")
    sb = pcs.alias("sb")
    inter_bits = F.bit_count(F.col("sa.mask").bitwiseAND(F.col("sb.mask")))
    union_bits = F.bit_count(F.col("sa.mask").bitwiseOR(F.col("sb.mask")))
    set_pairs = (
        sa.join(
            sb,
            (F.col("sa.pc_b") == F.col("sb.pc"))
            & (F.col("sa.mask") < F.col("sb.mask")),
        )
        .withColumn("n_common", inter_bits.cast("int"))
        .withColumn("jaccard", F.round(inter_bits / union_bits, 4))
        .filter(F.col("jaccard") >= threshold)
    )
    inter = (
        set_pairs.select(
            F.explode("sa.members").alias("x"),
            F.col("sb.members").alias("ys"),
            "n_common",
            "jaccard",
        )
        .select(
            "x", F.explode("ys").alias("y"), "n_common", "jaccard"
        )
        .select(
            F.least("x", "y").alias("doc_a"),
            F.greatest("x", "y").alias("doc_b"),
            "n_common",
            "jaccard",
        )
    )
    return _release_on_gc(intra.unionByName(inter), masks)


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    tokenizer: Column | None = None,
    with_size: bool = False,
) -> DataFrame:
    """MinHash signature per document: n_hashes min-of-seeded-hash columns
    (mh_00 .. mh_NN), engine-portable via md5.  ``tokenizer`` overrides the
    whitespace token set (e.g. ``char_ngrams(text_col)`` for shingle
    MinHash — the original MinHash use-case).  ``with_size`` adds a ``sz``
    column (token-set size) in the SAME groupBy — zero extra shuffles — so
    banded joins can apply the All-Pairs length cut (r14; see
    :func:`_size_compatible`)."""
    # a custom tokenizer may emit duplicates; wrap it in array_distinct —
    # MinHash values are duplicate-INVARIANT (min over repeated tokens is
    # identical), and ``sz`` must be the DISTINCT token count for the
    # All-Pairs cut to be lossless under BOTH verification modes: bitmask
    # jaccard is over distinct sets, and for the arrays mode
    # n <= d_min and (ms_a + ms_b - d_min) >= ms_max >= d_max give
    # j <= d_min/d_max, so d-denominated pruning can never drop a pair the
    # verifier would keep (the r14 review's multiset counterexample:
    # 'x x x x' vs 'x' — multiset cut pruned a bitmask-jaccard-1.0 pair)
    tok_col = (
        tokens(text_col) if tokenizer is None else F.array_distinct(tokenizer)
    )
    # _spread: the n_hashes x md5-per-token work is orders of magnitude
    # above the scan bytes, so a small parquet arrives as 1 split and the
    # whole signature stage runs single-threaded (q119 sf0.1 measured
    # ~3.5 s of md5 on 1 of 32 cores — the q34 r12 finding, same fix).
    # Values are unaffected: min is order-free.  At production scale the
    # scan already has >= parallelism splits and spread is identity.
    tok = _sp(df).select(
        F.col(id_col).alias("doc_id"), F.explode(tok_col).alias("token")
    )
    aggs = [
        F.min(hash60(F.concat(F.lit(f"{i}|"), F.col("token")))).alias(f"mh_{i:02d}")
        for i in range(n_hashes)
    ]
    if with_size:
        # count of exploded rows == F.size(tok_col) (explode emits one row
        # per element, duplicates and NULL elements included), so this sz
        # EQUALS the ``sz`` _docsets computes for verification — the
        # equality the length cut's losslessness rests on
        aggs.append(F.count(F.lit(1)).alias("sz"))
    return tok.groupBy("doc_id").agg(*aggs)


def _stacked_bands(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int,
    band_size: int,
    out_id: str = "doc_id",
    tokenizer: Column | None = None,
    with_size: bool = False,
) -> DataFrame:
    """(out_id, band_key[, sz]) rows: MinHash signatures banded and exploded
    — the shared LSH blocking stage of :func:`minhash_lsh_pairs` and
    :func:`incremental_dedup` (one definition, so the banding scheme
    cannot silently diverge between the two paths).  ``with_size`` carries
    the token-set size (one extra int per band row) so callers can prune
    size-incompatible candidates INSIDE the band join, before the
    ``distinct`` shuffle pays for them."""
    sigs = minhash_signatures(
        df, id_col, text_col, n_hashes, tokenizer, with_size=with_size
    )
    n_bands = n_hashes // band_size
    band_cols = [
        F.md5(
            F.concat_ws(
                "|",
                F.lit(str(b)),
                *[F.col(f"mh_{b * band_size + j:02d}") for j in range(band_size)],
            )
        ).alias(f"band_{b}")
        for b in range(n_bands)
    ]
    extra = ["sz"] if with_size else []
    return sigs.select("doc_id", *extra, *band_cols).select(
        F.col("doc_id").alias(out_id),
        *extra,
        F.explode(F.array(*[F.col(f"band_{b}") for b in range(n_bands)])).alias(
            "band_key"
        ),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    band_size: int = 2,
    threshold: float = 0.5,
    verify: str = "auto",
    tokenizer: Column | None = None,
    candidate_budget: int | None = None,
    on_budget: str = "error",
) -> DataFrame:
    """Banded-LSH candidate pairs verified with exact Jaccard.

    Signature rows are banded (``n_hashes / band_size`` bands); documents
    colliding in any band become candidates; candidates are verified against
    the exact token-set Jaccard so the output has no false positives (recall
    depends on banding parameters, as usual for LSH). ``verify`` picks the
    verification representation: 'bitmask' (vocab <= 64, popcount
    arithmetic), 'arrays' (general, ``array_intersect``), or 'auto'.
    ``tokenizer`` switches both the signatures and the verification to a
    custom token set (e.g. ``char_ngrams`` shingles).

    ``candidate_budget`` is the feasibility guard: banding is only
    sub-quadratic when true similarity is SPARSE — on a corpus where a
    large fraction of pairs really are near-dups, near-dup pairs collide
    in most bands and the candidate stream approaches
    ``n_bands × true_pairs`` (the r11 sf10 sweep measured ~7e9 projected
    candidates for q23 — past local shuffle disk).  When the sampled
    projection (:func:`estimate_lsh_candidates`) exceeds the budget the
    operator's default posture (``on_budget='error'``) RAISES with the
    projection and the levers — there is no lossless degrade below pair
    enumeration: if the pair list itself is the bottleneck, the answer is
    a coarser artifact (``dup_clusters``/``dedup_finalize`` keep one row
    per doc), a higher threshold with tighter banding, or corpus sharding.
    ``on_budget='representatives'`` takes the first lever automatically:
    it returns :func:`lsh_representatives` — the linear-stream cluster
    assignment ``(doc_id, rep_id, cluster_size)``, a DIFFERENT schema from
    the pair list (one row per doc, not per pair) — so a caller at
    pair-infeasible scale gets a usable dedup artifact instead of advice.
    """
    if on_budget not in ("error", "representatives"):
        raise ValueError(f"bad on_budget {on_budget!r}")
    projected: int | None = None
    if candidate_budget is not None:
        projected = estimate_lsh_candidates(
            df, id_col, text_col, n_hashes, band_size, tokenizer=tokenizer
        )
        if projected > candidate_budget:
            if on_budget == "representatives":
                return lsh_representatives(
                    df,
                    id_col,
                    text_col,
                    n_hashes=n_hashes,
                    band_size=band_size,
                    threshold=threshold,
                    verify=verify,
                    tokenizer=tokenizer,
                )
            raise ValueError(
                f"minhash_lsh_pairs: projected candidate stream "
                f"~{projected:,} pairs exceeds candidate_budget="
                f"{candidate_budget:,}; at this similarity density the "
                f"enumerated pair list is itself the bottleneck. Use "
                f"lsh_representatives (one row per doc; reachable as "
                f"minhash_lsh_pairs(on_budget='representatives') when "
                f"calling that operator directly), dup_clusters/"
                f"dedup_finalize, raise threshold with tighter banding "
                f"(larger band_size), or shard the corpus."
            )
    stacked = _stacked_bands(
        df, id_col, text_col, n_hashes, band_size, tokenizer=tokenizer,
        with_size=True,
    )
    a, b = stacked.alias("a"), stacked.alias("b")
    # _size_compatible INSIDE the join condition (r14): a lossless
    # All-Pairs length cut — any pruned pair has jaccard <= min(sz)/max(sz)
    # < threshold, so _verify_candidates would drop it anyway — applied
    # BEFORE the distinct so size-incompatible collisions never enter that
    # shuffle (the sf10 stream this guards measured 452.8M rows pre-cut;
    # same move the r13 prefix joins made).
    cand = (
        a.join(
            b,
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & _size_compatible(F.col("a.sz"), F.col("b.sz"), threshold),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return _verify_candidates(
        cand, _docsets(df, id_col, text_col, tokenizer), verify, threshold,
        projected_candidates=projected,
    )


def _docsets(
    df: DataFrame, id_col: str, text_col: str, tokenizer: Column | None
) -> DataFrame:
    """The ``(doc_id, toks, sz)`` verification input shared by
    :func:`minhash_lsh_pairs` and :func:`lsh_representatives` — one
    definition so the tokenization half of the verification contract
    cannot drift between the two paths (the jaccard half lives in
    :func:`_verify_candidates`).

    A custom tokenizer is distinct-wrapped: the operator's contract is
    token-SET jaccard, and before r14 a duplicate-emitting tokenizer made
    the two verify modes DISAGREE — bitmask computed true set jaccard
    while the arrays mode divided by multiset sizes ('x x x x' vs 'x':
    1.0 vs 0.25), so verify='auto' answered differently depending on
    vocabulary size (r14 review finding)."""
    tok_col = tokens(text_col) if tokenizer is None else F.array_distinct(tokenizer)
    return df.select(
        F.col(id_col).alias("doc_id"),
        tok_col.alias("toks"),
    ).withColumn("sz", F.size("toks"))


def _verify_candidates(
    cand: DataFrame,
    docsets: DataFrame,
    verify: str,
    threshold: float,
    dense_candidates: bool = True,
    projected_candidates: int | None = None,
) -> DataFrame:
    """Exact-Jaccard verification of a ``(doc_a, doc_b)`` candidate frame
    against a ``(doc_id, toks, sz)`` docsets frame — the shared final stage
    of :func:`minhash_lsh_pairs` and :func:`lsh_representatives` (one
    definition, so the two paths cannot silently diverge on the jaccard
    fixed-point/rounding contract).  Returns ``(doc_a, doc_b, n_common,
    jaccard)`` with ``jaccard`` already 4-rounded and thresholded.

    Verification tiers (all exact — explicit bit positions, no hashing):
    'bitmask' (vocab <= 64: one long, popcount), 'blockmask' (r15, vocab
    <= :data:`_BLOCKMASK_VOCAB_CAP`: multi-word bitsets — the same tier
    the prefix path has used since r13, now shared with EVERY candidate
    source including banded LSH; popcount over ~vocab/64 longs beats
    ``array_intersect``'s per-pair string hash-set both in CPU and in
    join-shuffle bytes when the mask is NARROW), 'intarrays' (r16, vocab
    <= :data:`_INTARRAYS_VOCAB_CAP`: ``array_intersect`` over
    dictionary-encoded int positions — O(sz) per pair regardless of
    vocabulary width, int hashing and ~4 B/token shuffle rows instead of
    strings), 'arrays' (general vocabularies).  'auto' probes vocabulary
    size through the same bounded-sample ladder the pair strategies use.

    ``dense_candidates`` steers 'auto' between the encoded tiers and
    arrays: the dictionary build is an O(corpus) fixed cost (vocab probe
    + position join + per-doc groupBy) that amortizes only over a
    candidate stream much larger than the corpus.  Pair ENUMERATION is
    that regime; the representatives path's hub-edge stream is LINEAR in
    the corpus and measured the other way (r15: q119 14.1 s arrays vs
    20.6 s blockmask — the fixed cost never amortizes), so
    :func:`lsh_representatives` passes False.

    Dense-auto ladder, all boundaries measured with interleaved same-JVM
    A/Bs and identical output checksums: vocab <= 64 → bitmask; <= 4096
    AND mask narrower than the token array (``n_words <= sampled
    avg_sz``) → blockmask (sf1, 5 words vs ~31 tokens: 9.0 s vs 15.5 s
    intarrays vs 36.4 s arrays); wider-or-larger up to 65536 →
    intarrays (r16 sf10, vocab 5246, 72.8M pairs: 226.6 s vs 293.7 s
    arrays, −23%); past the int cap → arrays.  Explicit pins are always
    honored."""
    if verify not in ("auto", "bitmask", "blockmask", "intarrays", "arrays"):
        raise ValueError(f"bad verify {verify!r}")
    small_vocab: list[str] | None = None
    if verify == "auto":
        # ONE sample-first probe (<= 2 bounded jobs) settles every tier
        # question — the r16 probe collapse; the sparse-candidates path
        # only needs the 64-bit-mask answer, so it probes at cap 64 and
        # keeps its former cost.  Dense streams probe at the int-tier cap:
        # when the blockmask is too wide (or the vocabulary exceeds its
        # 4096 cap outright) the fallback is now the int-array tier, not
        # strings — measured on the 72.8M-pair sf10 stream, interleaved
        # same-JVM with identical checksums: arrays 293.7 s median vs
        # intarrays 226.6 s (−23%; r16).  An open-vocabulary corpus whose
        # SAMPLE stays under the cap pays one bounded full-corpus distinct
        # collect before settling on arrays — linear, and small against
        # the dense verification join this path exists to serve.
        cap = _INTARRAYS_VOCAB_CAP if dense_candidates else 64
        small_vocab = _vocab_if_small(docsets, cap)
        if small_vocab is not None and len(small_vocab) <= 64:
            verify = "bitmask"
        elif small_vocab:
            # one bounded sample agg (same 4096-doc sample discipline as
            # the vocabulary probes) feeds both sub-gates below
            row = (
                docsets.limit(4096)
                .agg(F.avg("sz").alias("avg_sz"))
                .collect()[0]
            )
            avg_sz = float(row["avg_sz"] or 0.0)
            if (
                len(small_vocab) <= _BLOCKMASK_VOCAB_CAP
                and (len(small_vocab) + 63) // 64 <= avg_sz
            ):
                # width gate: narrow masks beat int arrays decisively
                # (sf1: blockmask 9.0 s vs intarrays 15.5 s vs 36.4 s
                # arrays)
                verify = "blockmask"
            elif projected_candidates is not None and avg_sz > 0:
                # amortization gate for the int tier: its dictionary
                # build (explode + position join + per-doc groupBy) is an
                # O(corpus-tokens) fixed cost the arrays tier never pays,
                # so it must be amortized by a candidate stream well past
                # the token relation.  Both sides measured at sf10,
                # interleaved, identical checksums: the token family's
                # ~453M-projected / 15.5M-token stream (ratio ~29) ran
                # 226.6 s intarrays vs 293.7 s arrays (−23%), while
                # q54's shingle degrade at 12.5M projected / ~30M trigram
                # rows (ratio 0.4) ran 189 s intarrays vs 84 s arrays —
                # the build never paid for itself.  2x the token relation
                # splits the two regimes with >5x margin on each side.
                # Unbudgeted callers (no projection) keep arrays — the
                # conservative status quo.
                token_rows = docsets.count() * avg_sz
                verify = (
                    "intarrays"
                    if projected_candidates >= 2 * token_rows
                    else "arrays"
                )
            else:
                verify = "arrays"
        else:
            verify = "arrays"
    if verify in ("blockmask", "intarrays"):
        # one bounded limit(cap+1) collect settles BOTH the cap check and
        # the vocabulary size (ZERO extra jobs when auto already probed) —
        # a pinned caller needs no separate distinct-count jobs
        cap = (
            _INTARRAYS_VOCAB_CAP if verify == "intarrays"
            else _BLOCKMASK_VOCAB_CAP
        )
        vocab_df, vocab_n = _vocab_positions(
            docsets,
            cap,
            f"{verify} verification requires vocabulary <= "
            f"{cap} distinct tokens; use "
            "verify='arrays' or 'auto'",
            vocab=small_vocab,
        )
        tokp = (
            docsets.select("doc_id", "sz", F.explode("toks").alias("token"))
            .join(F.broadcast(vocab_df), "token")
            .select("doc_id", "sz", "pos")
        )
        if verify == "intarrays":
            return _intset_pair_jaccard(
                cand, _intsets_from_tokp(tokp), threshold, size_cut=True
            )
        n_words = (max(vocab_n, 1) + 63) // 64
        masks = _blockmasks_from_tokp(tokp, n_words)
        return _blockmask_pair_jaccard(
            cand, masks, threshold, size_cut=True, n_words=n_words
        )
    if verify == "bitmask":
        masks = _doc_masks(docsets, vocab=small_vocab)
        va = masks.select(F.col("doc_id").alias("doc_a"), F.col("mask").alias("mask_a"))
        vb = masks.select(F.col("doc_id").alias("doc_b"), F.col("mask").alias("mask_b"))
        inter_bits = F.bit_count(F.col("mask_a").bitwiseAND(F.col("mask_b")))
        union_bits = F.bit_count(F.col("mask_a").bitwiseOR(F.col("mask_b")))
        return (
            cand.join(va, "doc_a")
            .join(vb, "doc_b")
            .withColumn("n_common", inter_bits.cast("int"))
            .withColumn("jaccard", F.round(inter_bits / union_bits, 4))
            .filter(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "n_common", "jaccard")
        )
    sa = docsets.select(
        F.col("doc_id").alias("doc_a"), F.col("toks").alias("toks_a"), F.col("sz").alias("sz_a")
    )
    sb = docsets.select(
        F.col("doc_id").alias("doc_b"), F.col("toks").alias("toks_b"), F.col("sz").alias("sz_b")
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        # lossless length cut before the set intersection (All-Pairs bound)
        .filter(_size_compatible(F.col("sz_a"), F.col("sz_b"), threshold))
        .withColumn("n_common", F.size(F.array_intersect("toks_a", "toks_b")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "jaccard")
    )


def lsh_representatives(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    band_size: int = 2,
    threshold: float = 0.5,
    verify: str = "auto",
    tokenizer: Column | None = None,
    algorithm: str = "star",
    max_iter: int | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """One row per document — ``(doc_id, rep_id, cluster_size)`` — via a
    LINEAR-candidate-stream LSH clustering: the measured escape hatch for
    the regime where :func:`minhash_lsh_pairs` raises its feasibility guard
    (``on_budget='representatives'`` routes here).

    On a self-similar corpus the banded pair join's shuffle approaches
    ``n_bands × true_pairs`` (the r11 sf10 sweep projected ~2.3e9 candidates
    for q23) because a bucket of m near-identical documents enumerates
    C(m, 2) candidates.  This operator never enumerates within-bucket
    pairs: each (band, bucket) contributes STAR EDGES from the bucket's
    minimum doc id to its other members — at most ``n_docs × n_bands``
    rows REGARDLESS of similarity density; every star edge is verified
    with the exact token Jaccard (also linear in edges), and clusters +
    representatives come from the O(log n)-round large-star/small-star
    connected components.  Every shuffle in the chain is linear in the
    corpus, so the plan survives the density that kills pair enumeration.

    Semantics vs enumerating all pairs then clustering: connectivity flows
    through verified hub edges only, so two documents that collide in a
    bucket but are each below-threshold-similar to the bucket hub do not
    merge through that bucket (every retained EDGE is exactly verified —
    no false merges via transitive false positives; recall is bounded by
    the banding as usual for LSH, minus hub-path misses).  That trade is
    what buys the linear stream — at pair-list-infeasible scale the
    alternative is no answer at all.  One recall guarantee IS absolute:
    exact-text duplicates always co-cluster (a dedicated md5(text) star
    tier, immune to bucket-hub hijack by a dissimilar lower-id doc).

    Output contract: exactly one row per non-NULL-id input document
    (NULL ids violate the id-keyed precondition shared with
    ``exact_dedup``); cluster members share ``rep_id`` (the component's
    minimum doc id), everything else is a singleton (``rep_id = doc_id``,
    ``cluster_size = 1``).  NULL-text documents produce no signature and
    no exact-tier hash, so they always stay singletons; EMPTY-string
    text is a real value (``tokens('') == ['']``) — empty docs co-cluster
    with other empties at jaccard 1.0, like any other identical text.

    Pass a dict as ``stats`` to receive ``{"edges_raw": n,
    "edges_verified": n, "edges_exact": n, "clusters": n}`` telemetry
    (each is a triggered count — scale-harness use, not the hot path).
    Since r14 ``edges_raw`` counts the hub-edge stream AFTER the lossless
    All-Pairs length cut (and the distinct) — r13-and-earlier recorded
    figures are pre-cut, so cross-round edges_raw comparisons straddling
    r14 partly measure the cut itself."""
    from foresttime_builder_spark.operators.graph import connected_components

    stacked = _stacked_bands(
        df, id_col, text_col, n_hashes, band_size, tokenizer=tokenizer,
        with_size=True,
    )
    # hub = bucket minimum via one window over the band shuffle.  The min
    # is over a NULL-masked (doc_id, sz) struct so the hub's token-set
    # size rides along for free: struct ordering is by doc_id first
    # (unique), the mask keeps NULL-id rows out of the min exactly as the
    # previous plain min("doc_id") did, and a NULL doc_id still fails the
    # <> filter — NULL-id rows can never mint an edge on either engine.
    hub = F.min(
        F.when(F.col("doc_id").isNotNull(), F.struct("doc_id", "sz"))
    ).over(Window.partitionBy("band_key"))
    edges = (
        stacked.withColumn("_hub", hub)
        .filter(F.col("doc_id") != F.col("_hub.doc_id"))
        # lossless All-Pairs length cut vs the hub (r14): a pruned edge has
        # jaccard < threshold and would fail _verify_candidates anyway, so
        # the verified edge set — the only thing connectivity flows
        # through — is unchanged; the cut just keeps the edge out of the
        # distinct shuffle and the verification joins
        .filter(_size_compatible(F.col("sz"), F.col("_hub.sz"), threshold))
        .select(
            F.col("_hub.doc_id").alias("doc_a"), F.col("doc_id").alias("doc_b")
        )
        .distinct()
    )
    verified = _verify_candidates(
        edges, _docsets(df, id_col, text_col, tokenizer), verify, threshold,
        # hub-edge stream is linear in the corpus: the blockmask tier's
        # O(corpus) mask build never amortizes here (measured — see
        # _verify_candidates docstring), so auto resolves to arrays
        dense_candidates=False,
    ).select("doc_a", "doc_b")
    # exact-duplicate star tier: hub edges alone cannot GUARANTEE that
    # two identical documents co-cluster — a dissimilar lower-id doc can
    # take the bucket-hub role and fail verification against both, a
    # hub-path miss (found by the property suite's identical-text
    # invariant).  One md5(text) window (32-byte shuffle keys, linear)
    # stars each exact-text group to its minimum id; those edges are
    # jaccard 1.0 by construction, so no verification join is needed.
    # NULL-text docs are excluded: they carry no signature and must stay
    # singletons per the output contract.
    exact_hub = F.min("doc_id").over(Window.partitionBy("_th"))
    exact_edges = (
        df.select(
            F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("_th")
        )
        .filter(F.col("_th").isNotNull())
        .withColumn("hub", exact_hub)
        .filter(F.col("doc_id") != F.col("hub"))
        .select(F.col("hub").alias("doc_a"), F.col("doc_id").alias("doc_b"))
    )
    lsh_verified = None
    if stats is not None:
        stats["edges_raw"] = edges.count()
        lsh_verified = verified.persist()
        verified = lsh_verified
        stats["edges_verified"] = verified.count()
        stats["edges_exact"] = exact_edges.count()
    verified = verified.unionByName(exact_edges)
    comp = connected_components(
        verified, src="doc_a", dst="doc_b", algorithm=algorithm,
        max_iter=max_iter,
    )
    if lsh_verified is not None:
        # the CC rounds materialized comp (checkpointed) — the persisted
        # edge relation is fully consumed; free it now instead of leaking
        # a cached DataFrame per stats invocation for the session lifetime
        lsh_verified.unpersist()
    ids = df.select(F.col(id_col).alias("doc_id")).filter(
        F.col("doc_id").isNotNull()
    )
    assigned = ids.join(
        comp.withColumnRenamed("id", "doc_id"), "doc_id", "left"
    ).select(
        "doc_id", F.coalesce(F.col("comp"), F.col("doc_id")).alias("rep_id")
    )
    if stats is not None:
        stats["clusters"] = (
            assigned.agg(F.countDistinct("rep_id")).collect()[0][0]
        )
    # cluster_size over one rep_id window — a single linear exchange,
    # no self-join (the CC output is checkpointed, so re-evaluating
    # `assigned` would be cheap, but one pass is cheaper still)
    return assigned.withColumn(
        "cluster_size",
        F.count(F.lit(1)).over(Window.partitionBy("rep_id")),
    )


def simhash(df: DataFrame, id_col: str, text_col: str, n_bits: int = 60) -> DataFrame:
    """SimHash fingerprint: sign-sum of per-token hash bits.

    Bit k of the fingerprint is 1 iff the majority of the document's distinct
    tokens have bit k set in their 60-bit hash. Emitted as a bigint
    ``simhash`` plus the token count.
    """
    tok = df.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("token")
    ).withColumn("h", hash60(F.col("token")))
    bit_sums = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        *[
            F.sum(F.shiftright(F.col("h"), k).bitwiseAND(F.lit(1))).alias(f"b{k}")
            for k in range(n_bits)
        ],
    )
    fp = None
    for k in range(n_bits):
        bit = (F.col(f"b{k}") * 2 > F.col("n_tokens")).cast("long") * F.lit(2**k).cast(
            "long"
        )
        fp = bit if fp is None else fp + bit
    return bit_sums.select("doc_id", fp.alias("simhash"), "n_tokens")


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    key_col: str,
    max_dist: int = 1,
    max_key_len: int = 64,
) -> DataFrame:
    """All pairs whose ``key_col`` strings are within edit distance
    ``max_dist`` (insert / delete / substitute), via deletion-neighborhood
    blocking — the sub-quadratic fuzzy-match join (the FastSS / SymSpell
    family):

    every key generates its full ≤ ``max_dist``-deletion neighborhood
    (itself, its |key| single-character deletions, and for ``max_dist=2``
    every double deletion — built by EXPLODING the 1-deletion step twice,
    so the deeper neighborhood composes from the shallow one instead of a
    nested-lambda HOF); two keys are within distance d **only if** their
    depth-d neighborhoods intersect (FastSS theorem).  Candidates come
    from one equi-join on the variant, a cheap length-difference cut
    prunes, exact ``levenshtein`` verifies — no all-pairs stage, and the
    blocking is lossless so the result equals the quadratic oracle.

    ``max_dist`` ≤ 2: the neighborhood is O(|key|^d) variants per row
    (~L²/2 at d=2), so d=2 is practical for the short keys fuzzy joins
    actually use (names, titles, SKUs) and is guarded by ``max_key_len``
    (a 1-scan plan-time probe raises with the offending length rather
    than silently exploding a 10 kB key into 50M variants).  Past d=2
    the right scale tool is q16/q23's set-similarity machinery.
    """
    if max_dist not in (1, 2):
        raise NotImplementedError(
            "deletion-neighborhood blocking supports max_dist in (1, 2); "
            "use token/shingle set similarity (q16/q23) for looser matches"
        )
    key = F.col(key_col)

    def _del1(col):
        # the string plus all its single-character deletions
        return F.array_union(
            F.array(col),
            F.when(
                F.length(col) > 0,
                F.transform(
                    F.sequence(F.lit(1), F.length(col)),
                    lambda i: F.concat(
                        F.substring(col, 1, i - 1),
                        col.substr(i + 1, F.length(col)),
                    ),
                ),
            ).otherwise(F.array().cast("array<string>")),
        )

    if max_dist == 2:
        probe = df.agg(F.max(F.length(key)).alias("m")).collect()[0]["m"]
        if probe is not None and probe > max_key_len:
            raise ValueError(
                f"max_dist=2 with keys up to {probe} chars would explode "
                f"~{probe * probe // 2} variants/row; raise max_key_len "
                f"above {probe} to accept, or use set-similarity (q16/q23)"
            )

    v = df.select(
        F.col(id_col).alias("vid"),
        key.alias("vkey"),
        F.explode(_del1(key)).alias("variant"),
    )
    if max_dist == 2:
        v = v.select(
            "vid",
            "vkey",
            F.explode(_del1(F.col("variant"))).alias("variant"),
        ).distinct()
    b = v.select(
        F.col("vid").alias("vid_b"),
        F.col("vkey").alias("vkey_b"),
        "variant",
    )
    cands = (
        v.join(b, "variant")
        .filter(F.col("vid") < F.col("vid_b"))
        .select(
            F.col("vid").alias("id_a"),
            F.col("vid_b").alias("id_b"),
            F.col("vkey").alias("key_a"),
            F.col("vkey_b").alias("key_b"),
        )
        .distinct()
    )
    return (
        cands.filter(
            F.abs(F.length("key_a") - F.length("key_b")) <= max_dist
        )
        .filter(F.levenshtein(F.col("key_a"), F.col("key_b")) <= max_dist)
        .select("id_a", "id_b", F.levenshtein("key_a", "key_b").alias("dist"))
    )


def incremental_dedup(
    history: DataFrame,
    batch: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    band_size: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Dedup a NEW batch against an already-kept history — the nightly
    production shape: the corpus is deduped once, then every ingest batch
    is checked against the persisted index instead of re-clustering the
    world.

    Per batch document, emits ``(id_col, verdict, match_id)``:

    - ``exact_hist``  — content hash collides with a history document
      (``match_id`` = smallest such history id);
    - ``exact_batch`` — content hash collides within the batch and this
      row is not the smallest id (``match_id`` = the keeper);
    - ``near_hist``   — shares a MinHash LSH band with a history document
      AND exact token-Jaccard >= ``threshold`` (``match_id`` = smallest
      verified history match) — no false positives, LSH-bounded recall;
    - ``kept``        — none of the above (``match_id`` NULL).

    The three predicates are computed independently and prioritized in
    that order, so the verdict is deterministic and order-free.

    Scale shape (100 TB history): every join is a hash equi-join — the
    content-hash anti/left joins shuffle 16-byte keys, the band join is
    the standard banded-LSH candidate shape (never all-pairs), and
    verification touches only candidates.  At production scale the
    history side's signatures/hashes would be persisted and incrementally
    maintained rather than recomputed; this operator recomputes them so
    the semantics stay self-contained (swap ``history`` for the persisted
    projection — the plan below the scan is identical).
    """
    if threshold <= 0 or threshold > 1:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if n_hashes % band_size != 0:
        raise ValueError(
            f"band_size {band_size} must divide n_hashes {n_hashes}"
        )

    # NULL text gets a tagged sentinel hash rather than md5(NULL)=NULL —
    # NULL keys never equi-join, so without this a NULL-text row would
    # silently vanish from the output instead of being judged
    content_h = F.when(
        F.col(text_col).isNull(), F.lit("<NULL>")
    ).otherwise(F.md5(F.col(text_col)))
    b_hash = batch.select(
        F.col(id_col).alias("_bid"),
        content_h.alias("_h"),
    )
    hist_keep = (
        history.select(content_h.alias("_h"), F.col(id_col).alias("_hid"))
        .groupBy("_h")
        .agg(F.min("_hid").alias("exact_hist_id"))
    )
    batch_keep = b_hash.groupBy("_h").agg(F.min("_bid").alias("batch_keep_id"))

    b_bands = _stacked_bands(
        batch, id_col, text_col, n_hashes, band_size, "_bid", with_size=True
    ).withColumnRenamed("sz", "_bsz0")
    h_bands = _stacked_bands(
        history, id_col, text_col, n_hashes, band_size, "_hid", with_size=True
    ).withColumnRenamed("sz", "_hsz0")
    cand = (
        b_bands.join(h_bands, "band_key")
        # lossless All-Pairs length cut (r14): a size-incompatible pair has
        # jaccard < threshold and would fail the near_keep verification —
        # pruning it here keeps it out of the distinct shuffle
        .filter(_size_compatible(F.col("_bsz0"), F.col("_hsz0"), threshold))
        .select("_bid", "_hid")
        .distinct()
    )
    bsets = batch.select(
        F.col(id_col).alias("_bid"),
        tokens(text_col).alias("_btoks"),
        F.size(tokens(text_col)).alias("_bsz"),
    )
    hsets = history.select(
        F.col(id_col).alias("_hid"),
        tokens(text_col).alias("_htoks"),
        F.size(tokens(text_col)).alias("_hsz"),
    )
    inter = F.size(F.array_intersect("_btoks", "_htoks"))
    union = F.col("_bsz") + F.col("_hsz") - inter
    near_keep = (
        cand.join(bsets, "_bid")
        .join(hsets, "_hid")
        .filter(inter / union >= F.lit(threshold))
        .groupBy("_bid")
        .agg(F.min("_hid").alias("near_hist_id"))
    )

    out = (
        b_hash.join(hist_keep, "_h", "left")
        .join(batch_keep, "_h")
        .join(near_keep, "_bid", "left")
    )
    verdict = (
        F.when(F.col("exact_hist_id").isNotNull(), F.lit("exact_hist"))
        .when(F.col("_bid") != F.col("batch_keep_id"), F.lit("exact_batch"))
        .when(F.col("near_hist_id").isNotNull(), F.lit("near_hist"))
        .otherwise(F.lit("kept"))
    )
    match_id = (
        F.when(F.col("exact_hist_id").isNotNull(), F.col("exact_hist_id"))
        .when(F.col("_bid") != F.col("batch_keep_id"), F.col("batch_keep_id"))
        .otherwise(F.col("near_hist_id"))
    )
    return out.select(
        F.col("_bid").alias(id_col),
        verdict.alias("verdict"),
        match_id.alias("match_id"),
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    candidate_budget: int | None = None,
) -> DataFrame:
    """Asymmetric near-superset detection: pairs where containment
    ``C(A, B) = |A ∩ B| / |A|`` >= threshold — document A is (almost)
    entirely inside B, which symmetric Jaccard misses when B is much
    longer (J = inter/union shrinks with |B|; C does not).  The
    RefinedWeb-style signal for "this page is a quoted copy plus
    boilerplate".

    Blocking is a LOSSLESS containment prefix filter, not LSH: for
    C(A, B) >= t, B must contain at least ``ceil(t*|A|)`` of A's tokens,
    so B must contain at least one of A's first ``|A| - ceil(t*|A|) + 1``
    tokens in rarest-first order (if it missed all of them it already
    misses too many).  Only those prefix tokens of the CONTAINED side
    join the full inverted index of the container side — exact recall,
    and because the prefix picks the rarest tokens, the candidate stream
    stays small (symmetric-MinHash banding was tried first and rejected:
    a 1.0-containment pair with Jaccard 0.3 — the operator's whole point
    — collides in a band with probability ~3%).

    Returns ``(contained_id, container_id, n_common, containment)`` with
    containment rounded to 4 decimals (the q16 convention); both
    directions of a mutual pair emit independently.

    ``candidate_budget``: the prefix filter keeps the stream small on
    REAL text (rare tokens are rare); on a synthetic heavily-duplicated
    corpus the output itself is near-quadratic (sf1 measured 141M pairs)
    and the prefix⋈index stream with it.  When the sampled projection
    (:func:`estimate_containment_candidates`) exceeds the budget the
    operator RAISES — containment has no lossless sub-enumeration form;
    the levers are a higher threshold, dedup-then-contain (cluster
    representatives first), or corpus sharding.
    """
    if threshold <= 0 or threshold > 1:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    # persisted: the tokenized relation feeds the prefix stage, the full
    # inverted index, AND both verification sides (the token_jaccard_pairs
    # discipline; without it the corpus re-tokenizes ~5x).  The ranked
    # rarest-first prefix below intentionally mirrors token_jaccard_pairs'
    # formula with the CONTAINED side's |A| as the sole denominator —
    # kept inline because the Jaccard path's prefix lives inside its
    # strategy branches and shares no extractable seam yet.
    docsets = df.select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("toks")
    ).withColumn("sz", F.size("toks")).persist()
    if candidate_budget is not None:
        projected = estimate_containment_candidates(docsets, threshold)
        if projected > candidate_budget:
            docsets.unpersist()
            raise ValueError(
                f"containment_pairs: projected candidate stream "
                f"~{projected:,} pairs exceeds candidate_budget="
                f"{candidate_budget:,}; the containment pair list is "
                f"output-bound on this corpus. Raise threshold, collapse "
                f"to representatives first (lsh_representatives or "
                f"dedup_finalize) and contain those, or shard the corpus."
            )
    tok = docsets.select(
        "doc_id", "sz", F.explode("toks").alias("token")
    ).persist()
    dfreq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("_df"))
    prefix = (
        tok.join(F.broadcast(dfreq), "token")
        .withColumn(
            "_rnk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("_df", "token")
            ),
        )
        .filter(
            F.col("_rnk")
            <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1
        )
        .select(F.col("doc_id").alias("contained_id"), "token")
    )
    index = tok.select(F.col("doc_id").alias("container_id"), "token")
    cand = (
        prefix.join(index, "token")
        .filter(F.col("contained_id") != F.col("container_id"))
        .select("contained_id", "container_id")
        .distinct()
    )
    sa = docsets.select(
        F.col("doc_id").alias("contained_id"),
        F.col("toks").alias("toks_a"),
        F.col("sz").alias("sz_a"),
    )
    sb = docsets.select(
        F.col("doc_id").alias("container_id"),
        F.col("toks").alias("toks_b"),
    )
    out = (
        cand.join(sa, "contained_id")
        .join(sb, "container_id")
        .withColumn("n_common", F.size(F.array_intersect("toks_a", "toks_b")))
        # filter on the UNROUNDED ratio: the prefix filter's lossless
        # guarantee holds for true containment >= t; a rounded filter
        # would admit boundary pairs the blocking never promised to find
        .filter(F.col("n_common") / F.col("sz_a") >= F.lit(threshold))
        .withColumn(
            "containment", F.round(F.col("n_common") / F.col("sz_a"), 4)
        )
        .select("contained_id", "container_id", "n_common", "containment")
    )
    return _release_on_gc(out, docsets, tok)
