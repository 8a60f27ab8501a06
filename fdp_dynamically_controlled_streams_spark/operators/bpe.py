"""BPE tokenizer training (Sennrich et al. 2016, arXiv:1508.07909) as a
distributed Spark job — the trainable-tokenizer stage of a training-data
pipeline (the text family's token counting uses a FIXED BPE-ish regex;
this learns the merge table itself).

Scale shape — the classic trick that makes BPE feasible at corpus scale:
training operates on the WORD-FREQUENCY TABLE, never the corpus. One
corpus tokenize pass builds (word, freq) — vocabulary-sized, ~10^6-10^7
rows for a 100 TB web corpus — and every merge round then touches only
that table: one explode of adjacent symbol pairs weighted by freq, one
map-side-combinable groupBy(pair), one bounded argmax (a `batch`-row
collect — the same bounded-control-scalar budget as the k-means centroids
and IVF cells; the batched acceptance rule in :func:`bpe_train` keeps the
learned table PROVABLY identical to one-merge-at-a-time training), and one
vocab-sized merge rewrite. Corpus cost is paid once; rounds cost O(vocab).

Determinism: the argmax tie-breaks by (freq DESC, left ASC, right ASC) —
total order, so the learned merge sequence is partition-invariant and
seed-free (property-tested, plus a hand-computed golden corpus).

Why there is NO SQL oracle for the catalog entry: each round rewrites
symbol arrays using the PREVIOUS round's learned pair — iterative
DATA-DEPENDENT string rewriting. An unrolled SQL twin would need the
merge strings as literals, which only the run itself produces; this is
exactly the "genuinely non-SQL-expressible" carve-out, so the entry is a
rows-only check backed by the golden + property tests here.

[ABSENT in reference: SURVEY §2.7 — LLM-pipeline engine extension.]
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: tokenizer shared with the tf-idf/BM25 family (one tokenization rule
#: repo-wide keeps oracles and operators consistent).
from fdp_dynamically_controlled_streams_spark.operators.tfidf import tokens


def _merge_once(syms: F.Column, left: str, right: str) -> F.Column:
    """Greedy left-to-right non-overlapping merge of (left, right) in a
    symbol array — the exact reference semantics: a single fold where the
    pair merges iff the accumulator's LAST element is ``left`` and the
    incoming symbol is ``right`` (property-tested against a plain-Python
    fold). JVM HOF: vocab-sized input, never corpus-sized."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.lit(left + right)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def word_freq_table(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(word, freq, syms): the vocabulary-sized training table — one corpus
    tokenize pass, symbols initialized to single characters."""
    wf = (
        tokens(docs, text_col, id_col)
        .groupBy(F.col("term").alias("word"))
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.expr("word").substr(i, F.lit(1)),
    )
    return wf.select("word", "freq", chars.alias("syms"))


def _accept_batch(
    rows: list[tuple[str, str, int, int, int]],
    created: set[str],
    bounded: bool = True,
) -> list[tuple[str, str, int]]:
    """The driver-side batched-acceptance rule of :func:`bpe_train`,
    factored pure so every clause — including the symbol-collision stop,
    which no random corpus has been observed to reach — is directly
    unit-testable (tests/test_bpe.py::test_accept_batch_*).

    ``rows`` are (l, r, pf, max_in(l), max_out(r)) in (pf DESC, l ASC,
    r ASC) rank order; ``created`` is the multi-char symbol universe so
    far and is UPDATED in place with each accepted concatenation."""
    accepted: list[tuple[str, str, int]] = []
    used: set[str] = set()
    bounds: list[int] = []
    for left, right, pf, max_in, max_out in rows:
        if accepted:
            if left in used or right in used:
                break
            if any(pf <= bj for bj in bounds):
                break
        accepted.append((left, right, pf))
        used.update((left, right))
        if bounded:
            bounds.append(min(pf, max(max_in, max_out)))
        collided = left + right in created
        created.add(left + right)
        if collided:
            # symbol-string collision (r10 ADVICE): occurrences of the
            # pre-existing 'lr' symbol become indistinguishable from the
            # new ones, so pairs involving it GAIN occurrences and later
            # candidates' counts may be stale — end the batch here (this
            # accept itself was proven against the pre-merge table).
            break
    return accepted


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 16,
    batch: int = 8,
    stats: dict | None = None,
) -> DataFrame:
    """Learn the top ``n_merges`` BPE merges from the corpus. Returns
    (rank, left, right, pair_freq) — rank 1 is the first-learned merge.
    Stops early if no adjacent pair remains (fully merged vocabulary).

    Batched rounds (r9 verdict task 5): one-collect-per-merge serializes a
    32k-merge production vocabulary into 32k sequential Spark jobs, so each
    round collects the top ``batch`` candidates (ONE bounded driver
    round-trip) and accepts the longest prefix that is PROVABLY the next
    merges sequential BPE would learn — bit-for-bit, including pair_freq:

      * contiguous prefix of the (pf DESC, l ASC, r ASC) ranking — a
        skipped conflicting pair could still out-rank everything below it
        after the merge, so the batch stops at the first rejection;
      * symbol-disjoint from every earlier accepted pair — merging (a,b)
        cannot touch an occurrence of (c,d) when {c,d} ∩ {a,b} = ∅, and
        existing-pair counts NEVER increase under a merge (merges only
        consume adjacencies), so the candidate's count is exactly its
        original-table count at its sequential step;
      * count strictly above every earlier accepted pair's new-pair bound
        Bound_j = min(pf_j, max(maxIn(l_j), maxOut(r_j))): a pair created
        by merging (l,r)→lr is (x,lr) or (lr,y) or (lr,lr), and each such
        occurrence was an occurrence of (x,l) / (r,y) / (r,l) in the
        original table — so no pair born inside the batch can beat OR TIE
        (tie-break order on fresh strings is unknowable) an accepted one;
      * the batch STOPS (accepts nothing after) when an accepted pair's
        concatenation l+r is string-identical to an ALREADY-EXISTING
        symbol (r10 ADVICE): string symbols make the old and new 'lr'
        indistinguishable, so pairs involving that symbol GAIN
        occurrences mid-batch and the never-increase premise above no
        longer holds for later candidates.  The check is exact and free
        on the driver — initial symbols are single characters, so the
        multi-char symbol universe is precisely {l+r} of the accepted
        merges so far.

    Acceptance shrinks to 1 only on adversarial corpora (everything shares
    symbols); natural text accepts several merges per round. Equality with
    the sequential plain-Python trainer is hypothesis-tested
    (tests/test_bpe.py::test_bpe_batched_matches_sequential_hypothesis);
    the collision stop is unit-tested on the factored-out pure rule
    (tests/test_bpe.py::test_accept_batch_symbol_collision) — a 50k-corpus
    random search found no natural corpus reaching it, consistent with the
    structural argument that an adjacency between two OLD symbols never
    forms anew (new adjacencies always involve the freshly created
    symbol), but the guard keeps the proof airtight either way.
    """
    vocab = word_freq_table(docs, text_col, id_col).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    created: set[str] = set()  # every multi-char symbol ever introduced
    while len(merges) < n_merges:
        b = min(max(1, batch), n_merges - len(merges))
        # Materialized per round: three consumers read this table (the
        # top-b ranking and BOTH adjacency-maxima aggs behind Bound_j) —
        # without the cut each re-ran the explode + groupBy over the
        # vocabulary, the round's expensive pass. Pair-vocabulary-sized,
        # bounded by distinct adjacent symbol pairs, never corpus-sized.
        pairs = (
            vocab.select(
                "freq",
                F.explode(
                    F.zip_with(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1),
                        F.slice(F.col("syms"), 2, F.size("syms") - 1),
                        lambda a, b: F.struct(
                            a.alias("l"), b.alias("r")
                        ),
                    )
                ).alias("p"),
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("pf"))
            .localCheckpoint()
        )
        # bounded argmax: `batch` rows leave the cluster per round (the
        # k-means-centroid budget); total order = partition-invariant.
        # maxIn(s) / maxOut(s) = the adjacency maxima behind Bound_j, read
        # off the SAME pair table inside the same job.
        topb = pairs.orderBy(F.desc("pf"), F.asc("l"), F.asc("r")).limit(b)
        if b > 1:
            mi = pairs.groupBy(F.col("r").alias("sym")).agg(
                F.max("pf").alias("max_in")
            )
            mo = pairs.groupBy(F.col("l").alias("sym")).agg(
                F.max("pf").alias("max_out")
            )
            topb = (
                topb.join(mi, topb["l"] == mi["sym"], "left")
                .drop("sym")
                .join(mo, topb["r"] == mo["sym"], "left")
                .drop("sym")
            )
        rows = topb.orderBy(F.desc("pf"), F.asc("l"), F.asc("r")).collect()
        if not rows:
            break
        accepted = _accept_batch(
            [
                (
                    row["l"],
                    row["r"],
                    int(row["pf"]),
                    int(row["max_in"] or 0) if b > 1 else 0,
                    int(row["max_out"] or 0) if b > 1 else 0,
                )
                for row in rows
            ],
            created,
            bounded=b > 1,
        )
        col = F.col("syms")
        for left, right, pf in accepted:
            merges.append((len(merges) + 1, left, right, pf))
            col = _merge_once(col, left, right)
        if stats is not None:
            # optional telemetry for scale measurement: per-round accepted
            # count -> realized acceptance factor = merges / driver rounds
            stats.setdefault("accepted_per_round", []).append(len(accepted))
        vocab = vocab.select("word", "freq", col.alias("syms")).localCheckpoint()
    return docs.sparkSession.createDataFrame(
        merges, "rank int, left string, right string, pair_freq long"
    )


def bpe_apply(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize with a learned merge list (rank order): per doc,
    (doc_id, n_bpe_tokens, n_chars_tokenized). The merge list rides as
    plan literals, all JVM-side.

    Scale shape: the m folds run once per DISTINCT TERM — the vocabulary
    table, ~10^6-10^7 rows at 100 TB — and the corpus-sized (doc, term,
    tf) table picks the result up through one term-keyed equi-join. The
    previous form folded per (doc, term) pair (~10^4× more fold work at
    web scale for the identical answer); the join is the strictly
    cheaper shuffle."""
    w = tokens(docs, text_col, id_col).groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    syms = F.transform(
        F.sequence(F.lit(1), F.length("term")),
        lambda i: F.expr("term").substr(i, F.lit(1)),
    )
    col = syms
    for left, right in merges:
        col = _merge_once(col, left, right)
    per_term = (
        w.select("term")
        .distinct()
        .select(
            "term", F.size(col).alias("n_sym"), F.length("term").alias("n_chr")
        )
    )
    return (
        w.join(per_term, "term")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("tf") * F.col("n_sym")).alias("n_bpe_tokens"),
            F.sum(F.col("tf") * F.col("n_chr")).alias("n_chars_tokenized"),
        )
    )


def bpe_apply_sql(
    merges: list[tuple[str, str]],
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`bpe_apply` for a FIXED merge list, built on a
    genuinely different mechanism (pinning ``_merge_once`` against an
    independent engine): each term is spelled as separator-wrapped symbols
    (``_t__a__b__l__e_``) and one ``replace(s, '_l__r_', '_lr_')`` per
    merge performs the greedy left-to-right non-overlapping whole-symbol
    merge — ``replace`` scans left to right, never rescans replaced text,
    and the ``_sym_`` wrapping makes mid-symbol matches impossible (terms
    are [a-z0-9]+ so '_' cannot occur inside a symbol). This equals the
    fold semantics exactly, including the left==right run-parity case
    (law-tested in tests/test_bpe.py). Symbol count = separator pairs."""
    rep = r"regexp_replace(term, '(.)', '_\1_', 'g')"
    for left, right in merges:
        rep = f"replace({rep}, '_{left}__{right}_', '_{left}{right}_')"
    return rf"""
WITH toks AS (
  SELECT {id_col} AS doc_id, t.term
  FROM {table},
       UNNEST(regexp_split_to_array(lower({text_col}), '[^a-z0-9]+')) AS t(term)
  WHERE t.term <> ''
), tdc AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, term
), per_term AS (
  SELECT term,
         (length(r) - length(replace(r, '_', ''))) // 2 AS n_sym,
         length(term) AS n_chr
  FROM (SELECT DISTINCT term, {rep} AS r FROM tdc)
), j AS (
  SELECT d.doc_id, d.tf, p.n_sym, p.n_chr
  FROM tdc d JOIN per_term p USING (term)
)
SELECT doc_id,
       CAST(sum(tf * n_sym) AS BIGINT) AS n_bpe_tokens,
       CAST(sum(tf * n_chr) AS BIGINT) AS n_chars_tokenized
FROM j GROUP BY doc_id
"""


def bpe_train_py(texts: list[str], n_merges: int):
    """Plain-Python reference trainer sharing only the DEFINITION with
    :func:`bpe_train`: word-frequency table, most-frequent adjacent pair
    with (freq desc, left asc, right asc) tie-break, greedy left-to-right
    non-overlapping merge. Used by the hypothesis property tests AND as
    the catalog entry's py-reference oracle (the harness compares the
    Spark-learned merge table against this on the same corpus — the
    rows-only carve-out with an actual check behind it).
    Returns (merges [(rank, left, right, pair_freq)], final vocab, wf)."""
    import re
    from collections import Counter

    wf: Counter = Counter()
    for t in texts:
        for w in re.split(r"[^a-z0-9]+", t.lower()):
            if w:
                wf[w] += 1
    vocab = {w: list(w) for w in wf}
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += wf[w]
        if not pairs:
            break
        (left, right), pf = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, left, right, pf))
        for w, syms in vocab.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            vocab[w] = out
    return merges, vocab, wf
