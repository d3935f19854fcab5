"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting.

All hot-path logic is Catalyst built-ins (regexp counts, split/size,
aggregate) so the operators run inside whole-stage codegen at any scale —
a 100 TB documents table never leaves the JVM. The oracle-checkable scoring
formulas are deliberately simple closed-form expressions over the text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F
from ..pinning import pin

# marker stopwords per language — a tiny n-gram/stopword heuristic
# (real systems swap in fastText; the *Spark shape* — score per language,
# argmax — is identical)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "das"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "que", "es", "los"],
    "zh": ["的", "是", "了", "在", "我"],
}

EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "as", "with",
]


def token_count(c: Column) -> Column:
    """Whitespace token count (0 for empty/blank)."""
    trimmed = F.trim(c)
    return F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+")))


def bpe_ish_token_count(c: Column) -> Column:
    """BPE-ish subword count: word chunks + digits + punctuation marks,
    via one regexp extraction — a cheap token-budget estimator."""
    return F.size(F.regexp_extract_all(c, F.lit(r"[A-Za-z]{1,6}|\d|[^\sA-Za-z\d]"), 0))


def _count_matches(c: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(c, F.lit(pattern), 0))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append quality-score features: lengths, ratios, stopword share.

    Columns: n_tokens, n_chars_calc, avg_word_len, punct_ratio,
    digit_ratio, stopword_ratio, quality_score (0..1 composite).
    """
    t = F.col(text_col)
    n_tokens = token_count(t)
    n_chars = F.length(t)
    punct = _count_matches(t, r"[^\w\s]")
    digits = _count_matches(t, r"\d")
    words = F.split(F.trim(t), r"\s+")
    stop_hits = F.size(F.filter(
        words, lambda w: F.lower(w).isin(EN_STOPWORDS)))

    out = (
        df.withColumn("n_tokens", n_tokens)
        .withColumn("n_chars_calc", n_chars)
        .withColumn(
            "avg_word_len",
            F.when(n_tokens > 0,
                   (n_chars - (n_tokens - 1)).cast("double") / n_tokens)
            .otherwise(F.lit(0.0)))
        .withColumn("punct_ratio",
                    F.when(n_chars > 0, punct.cast("double") / n_chars)
                    .otherwise(F.lit(0.0)))
        .withColumn("digit_ratio",
                    F.when(n_chars > 0, digits.cast("double") / n_chars)
                    .otherwise(F.lit(0.0)))
        .withColumn("stopword_ratio",
                    F.when(n_tokens > 0, stop_hits.cast("double") / n_tokens)
                    .otherwise(F.lit(0.0)))
    )
    # composite score: in-range length, low punct/digit noise, some stopwords
    length_ok = F.when((F.col("n_tokens") >= 5) & (F.col("n_tokens") <= 5000),
                       F.lit(1.0)).otherwise(F.lit(0.0))
    score = (
        0.4 * length_ok
        + 0.2 * (1.0 - F.least(F.col("punct_ratio") * 5, F.lit(1.0)))
        + 0.2 * (1.0 - F.least(F.col("digit_ratio") * 5, F.lit(1.0)))
        + 0.2 * F.least(F.col("stopword_ratio") * 4, F.lit(1.0))
    )
    return out.withColumn("quality_score", F.round(score, 6))


# fastText-style quality-classifier weights (literal constants so the
# scoring expression is pure codegen AND replayable in any SQL engine;
# a trained model would ship its weights the same way)
QUALITY_LR = {
    "bias": -1.2,
    "log_tokens": 0.5,
    "avg_word_len": 0.15,
    "punct_ratio": -4.0,
    "digit_ratio": -3.0,
    "stopword_ratio": 2.0,
}


def quality_classifier(df: DataFrame, text_col: str = "text",
                       weights: dict | None = None) -> DataFrame:
    """Logistic quality classifier over the curation features — the
    cheap model-based keep/drop filter of LLM data pipelines (the shape
    of fastText/CCNet quality filters), as ONE codegen projection.

    Appends ``lr_score`` (rounded to 6 decimals) and ``keep``
    (score >= 0.5, decided on the ROUNDED score so the boolean can
    never flip on a cross-engine 1-ulp difference in exp/ln).
    Scale: zero shuffle — a map-side filter at any corpus size.
    """
    w = weights or QUALITY_LR
    feats = quality_features(df, text_col)
    z = (
        F.lit(w["bias"])
        + F.lit(w["log_tokens"]) * F.log1p(F.col("n_tokens"))
        + F.lit(w["avg_word_len"]) * F.col("avg_word_len")
        + F.lit(w["punct_ratio"]) * F.col("punct_ratio")
        + F.lit(w["digit_ratio"]) * F.col("digit_ratio")
        + F.lit(w["stopword_ratio"]) * F.col("stopword_ratio")
    )
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return (feats.withColumn("lr_score", score)
            .withColumn("keep", F.col("lr_score") >= 0.5))


def repetition_features(df: DataFrame, text_col: str = "text",
                        n: int = 3) -> DataFrame:
    """Gopher/C4-style repetition signal: the fraction of duplicate
    word n-grams in a document (boilerplate and spam repeat themselves;
    high dup_ngram_ratio is a standard drop rule in training-data
    curation).

    Appends n_ngrams (with repeats), n_distinct_ngrams, dup_ngram_ratio
    = 1 - distinct/total, over the same lower/\\s+-collapsed
    normalization as the dedup shinglers. Pure Catalyst expressions —
    no shuffle, no Python; at 100 TB this is a map-only pass fused into
    whatever scan feeds it.
    """
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    words = F.split(norm, " ")
    k = F.greatest(F.size(words) - F.lit(n - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(0), k - 1),
        lambda i: F.array_join(F.slice(words, i + 1, n), " "))
    total = F.size(grams)
    distinct = F.size(F.array_distinct(grams))
    return (
        df.withColumn("n_ngrams", total.cast("int"))
        .withColumn("n_distinct_ngrams", distinct.cast("int"))
        .withColumn(
            "dup_ngram_ratio",
            F.round(F.lit(1.0) - distinct.cast("double") / total, 6))
    )


def lang_scores(c: Column) -> list[tuple[str, Column]]:
    """Per-language marker-hit share of tokens (the langid signal)."""
    words = F.split(F.trim(F.lower(c)), r"\s+")
    n = F.greatest(F.size(words), F.lit(1))
    out = []
    for lang, markers in LANG_MARKERS.items():
        hits = F.size(F.filter(words, lambda w: w.isin(markers)))
        out.append((lang, hits.cast("double") / n))
    return out


def detect_language(df: DataFrame, text_col: str = "text",
                    out_col: str = "lang_pred") -> DataFrame:
    """Argmax language over marker scores; 'und' when all scores are 0.

    Deterministic tie-break: language-code ascending (stable, oracle-able).
    """
    scores = lang_scores(F.col(text_col))
    arr = F.array(*[
        F.struct(s.alias("score"), F.lit(lang).alias("lang"))
        for lang, s in sorted(scores, key=lambda x: x[0])
    ])
    best = F.array_max(F.filter(arr, lambda s: s["score"] > 0))
    return df.withColumn(
        out_col, F.coalesce(best["lang"], F.lit("und")))


def rolling_fingerprint(c: Column, base: int = 257,
                        mod: int = (1 << 31) - 1) -> Column:
    """Polynomial rolling hash of the normalized text (document
    fingerprint): fold over characters of ascii codes. Catalyst aggregate
    over the char array — deterministic, order-sensitive, no UDF."""
    norm = F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))
    chars = F.split(norm, "")
    return F.aggregate(
        F.filter(chars, lambda ch: ch != ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * base + F.ascii(ch)) % mod,
    )


def text_stats(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """The full text-analysis bundle, one pass: id, token counts, quality
    features, language prediction, fingerprint."""
    out = quality_features(df, text_col)
    out = detect_language(out, text_col)
    out = out.withColumn("fingerprint", rolling_fingerprint(F.col(text_col)))
    out = out.withColumn("n_tokens_bpe", bpe_ish_token_count(F.col(text_col)))
    return out


# PII patterns — kept inside the Java-regex ∩ RE2 common subset (no
# lookaround, no backrefs) so the DuckDB oracle applies the IDENTICAL
# patterns; replacement order is part of the contract (email first so the
# digit-run patterns never see addresses' digits).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d() -]{6,}\d", "<PHONE>"),
]


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrub emails / IPv4s / phone-like digit runs, appending
    `{kind}_found` counts and a `redacted` text column.

    Pure codegen regexp_replace/regexp_extract_all — no Python, no
    shuffle; at 100 TB this is a map-only pass fused into the scan."""
    out = df
    red = F.col(text_col)
    for kind, pat, token in PII_PATTERNS:
        out = out.withColumn(
            f"{kind}_found",
            F.size(F.regexp_extract_all(red, F.lit(pat), 0)))
        red = F.regexp_replace(red, pat, token)
    return out.withColumn("redacted", red)


def bigram_surprisal(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Corpus-level bigram language-model quality score per document.

    Plan (all distributed, no driver collect):
      1. ONE Arrow mapInPandas pass counts bigrams per document (Counter
         in the kernel), emitting (id, w1, w2, cnt) at distinct-bigram
         grain — the occurrence stream never exists as a DataFrame and
         never shuffles; the collapsed frame is persisted for the
         downstream aggregates;
      3. corpus tables: bigram counts c(w1,w2), context counts c(w1),
         vocabulary size V (a 1-row broadcast);
      4. weighted average of the add-one-smoothed surprisal
         -ln((c(w1,w2)+1) / (c(w1)+V)) recovers the per-occurrence mean.

    Gibberish/boilerplate scores high (rare transitions), fluent text low
    — the classic cheap perplexity filter for training-data curation.
    Shuffle cost: groupBys and joins keyed on (w1, w2) and w1, all
    O(distinct bigrams); at 100 TB the corpus count tables are the same
    aggregates any LM tokenizer-counting job already runs.
    """
    # Bigram counting happens INSIDE the Arrow kernel (a Counter per doc
    # emitted as (id, w1, w2, cnt) rows): the per-doc aggregation is
    # map-side by construction, so the bigram OCCURRENCE stream never
    # exists as a DataFrame and never shuffles — doc_bg materializes
    # directly at distinct-bigrams-per-doc grain. Every corpus statistic
    # then derives from this collapsed frame.
    import pandas as pd

    def count_fn(batches):
        import re
        from collections import Counter

        for pdf in batches:
            ids, w1s, w2s, cnts = [], [], [], []
            for i, t in zip(pdf["__id"], pdf["__text"]):
                if t is None:
                    continue
                norm = re.sub(r"\s+", " ", t.lower(), flags=re.ASCII).strip()
                w = [x for x in norm.split(" ") if x]
                c = Counter(zip(w, w[1:]))
                ids.extend([i] * len(c))
                for (a, b), n in c.items():
                    w1s.append(a)
                    w2s.append(b)
                    cnts.append(n)
            yield pd.DataFrame({"__id": ids, "w1": w1s, "w2": w2s,
                                "cnt": cnts})

    src = df.select(F.col(id_col).alias("__id"),
                    F.col(text_col).alias("__text"))
    doc_bg = src.mapInPandas(
        count_fn, "__id long, w1 string, w2 string, cnt long") \
        .transform(pin)
    bg_counts = doc_bg.groupBy("w1", "w2").agg(F.sum("cnt").alias("cb"))
    ctx_counts = bg_counts.groupBy("w1").agg(F.sum("cb").alias("c1"))
    vocab = bg_counts.select(
        F.explode(F.array("w1", "w2")).alias("w")
    ).agg(F.countDistinct("w").alias("v"))

    scored = (
        doc_bg.join(bg_counts, ["w1", "w2"])
        .join(ctx_counts, "w1")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "surprisal",
            -F.log((F.col("cb") + 1) / (F.col("c1") + F.col("v"))))
        .groupBy("__id")
        .agg((F.sum(F.col("cnt") * F.col("surprisal"))
              / F.sum("cnt")).alias("surprisal"),
             F.sum("cnt").alias("n_bigrams"))
    )
    return scored.select(F.col("__id").alias(id_col), "surprisal",
                         "n_bigrams")


def chunk_documents(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", chunk_tokens: int = 64,
                    overlap: int = 16) -> DataFrame:
    """Split documents into fixed-token-budget chunks with overlap — the
    standard pre-tokenization step of an LLM training pipeline.

    Chunks are windows of ``chunk_tokens`` whitespace tokens advancing by
    ``chunk_tokens - overlap``; the last window is kept iff it adds new
    tokens. Output: (id, chunk_idx, chunk_text, n_tokens) — one row per
    chunk, exploded, so downstream dedup/quality/tokenize operators apply
    unchanged to chunks.

    Pure-Catalyst: split + sequence + slice under an explode — stays in
    codegen, map-only (zero shuffle), and SQL-replayable for the oracle.
    At 100 TB the row amplification is bounded by ~len/(chunk-overlap)
    per doc and the operator fuses into the scan.
    """
    if overlap >= chunk_tokens:
        raise ValueError(
            f"overlap ({overlap}) must be < chunk_tokens ({chunk_tokens})")
    from .dedup import normalize_text

    step = chunk_tokens - overlap
    words = F.filter(F.split(normalize_text(F.col(text_col)), " "),
                     lambda x: x != "")
    n = F.size(words)
    # starts: 0, step, 2*step, ... while start + overlap < n  (i.e. the
    # window contributes at least one token beyond the previous one);
    # always at least one chunk for a non-empty doc
    n_chunks = F.when(
        n <= chunk_tokens, F.lit(1)
    ).otherwise(F.ceil((n - F.lit(chunk_tokens)) / F.lit(step)) + 1)
    idx = F.sequence(F.lit(0), n_chunks.cast("int") - 1)
    return (
        df.where(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.col(id_col), words.alias("__w"),
                F.explode(idx).alias("chunk_idx"))
        .select(
            id_col, "chunk_idx",
            F.array_join(
                F.slice(F.col("__w"), F.col("chunk_idx") * step + 1,
                        chunk_tokens), " ").alias("chunk_text"),
            F.least(
                F.size(F.col("__w")) - F.col("chunk_idx") * step,
                F.lit(chunk_tokens)).alias("n_tokens"))
    )


def bm25_topk(df: DataFrame, query_terms: list[str], k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """BM25 keyword retrieval (Lucene-style idf: ln(1 + (N-df+.5)/(df+.5))).

    Output: (id, score) of the top-k documents for the term set, ordered
    by score desc then id.

    Scale plan (100 TB corpus):
    - document length is ``size(split(text))`` — a projection, no shuffle;
    - the explode + IN filter run fused in one whole-stage-codegen pass
      (an interpreted array-HOF pre-filter would be slower per token), so
      the posting-list shuffle carries only matching terms — a few rows
      per doc, never the full token stream;
    - corpus stats (N, avgdl) and per-term document frequencies are
      KB-sized aggregates, joined back by broadcast;
    - the final top-k is ``orderBy(...).limit(k)`` which Spark executes as
      TakeOrderedAndProject — per-partition heaps, no global sort spill.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.select(F.col(id_col).alias("id"),
                     F.size(toks).alias("dl"), toks.alias("__toks"))
    n_docs, avgdl = base.agg(F.count("*"), F.avg("dl")).collect()[0]
    if not n_docs:
        # Empty corpus: avgdl is NULL and idf would divide by 0.5 of
        # nothing — return a typed empty (id, score) frame instead.
        return base.select(F.col("id"),
                           F.lit(0.0).alias("score")).limit(0)
    posts = (base.select("id", "dl", F.explode("__toks").alias("term"))
             .where(F.col("term").isin(*query_terms)))
    tf = posts.groupBy("id", "dl", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(
        F.countDistinct("id").alias("df_t"))
    idf = F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df_t") + 0.5)
                / (F.col("df_t") + 0.5))
    sat = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / float(avgdl)))
    scored = (tf.join(F.broadcast(dfreq), "term")
              .withColumn("__s", idf * sat)
              .groupBy("id").agg(F.sum("__s").alias("score")))
    return (scored.orderBy(F.col("score").desc(), F.col("id").asc())
            .limit(k))


def phrase_search(df: DataFrame, phrase: list[str],
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Exact-phrase matching via a positional posting join — the search
    capability bag-of-words BM25 cannot express.

    Output: (id, n_matches) for documents containing the consecutive
    token sequence ``phrase`` at least once.

    Scale plan: posexplode emits (doc, pos, term) but the IN filter on
    the phrase's terms is FUSED into the same codegen stage, so only
    postings of the phrase terms ever shuffle (a few rows per doc, never
    the token stream). Adjacency is then |phrase|-1 equi-joins on
    (doc, pos+offset) over those tiny posting sets — at 100 TB the
    filtered postings for a phrase are MBs, and each join is
    broadcast-eligible.
    """
    if not phrase:
        raise ValueError("phrase must be non-empty")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    posts = (
        df.select(F.col(id_col).alias("id"),
                  F.posexplode(toks).alias("pos", "term"))
        .where(F.col("term").isin(*set(phrase)))
    )
    cur = (posts.where(F.col("term") == phrase[0])
           .select("id", F.col("pos").alias("p0")))
    for i, term in enumerate(phrase[1:], start=1):
        nxt = posts.where(F.col("term") == term).select(
            "id", (F.col("pos") - i).alias("p0"))
        cur = cur.join(nxt, ["id", "p0"])
    return (cur.groupBy("id")
            .agg(F.count("*").alias("n_matches")))


def bpe_pair_counts(df: DataFrame, top_n: int = 50,
                    text_col: str = "text") -> DataFrame:
    """One BPE-training iteration: adjacent character-pair frequencies.

    Output: (pair, freq) for the ``top_n`` most frequent adjacent
    character pairs, weighted by word occurrence count — the statistic a
    BPE trainer maximizes when choosing the next merge.

    Scale plan: the corpus-sized work is ONE explode+count shuffle down to
    the distinct-word vocabulary (Zipfian, so map-side partial aggregation
    collapses it: a 100 TB corpus has a vocab measured in MBs). Pair
    extraction then runs over vocab rows only — the ``sequence`` +
    ``substring`` transform touches thousands of words, not trillions of
    tokens — followed by a second KB-sized shuffle on the pair.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    vocab = (df.where(F.trim(F.col(text_col)) != "")
             .select(F.explode(toks).alias("word"))
             .groupBy("word").agg(F.count("*").alias("wfreq")))
    # length >= 2 guard: Spark's sequence(1, 0) yields a DESCENDING [1, 0]
    # (not empty), which would fabricate single-char pairs for 1-char words
    pairs = vocab.where(F.length("word") >= 2).select(
        "wfreq",
        F.explode(F.expr(
            "transform(sequence(1, length(word) - 1), "
            "i -> substring(word, i, 2))")).alias("pair"))
    counts = pairs.groupBy("pair").agg(F.sum("wfreq").alias("freq"))
    return (counts.orderBy(F.col("freq").desc(), F.col("pair").asc())
            .limit(top_n))


def inverted_index(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", min_df: int = 1,
                   max_df_ratio: float = 1.0) -> DataFrame:
    """Materialize a term → posting-list inverted index.

    Output: (term, df_t, postings) with postings ascending. ``min_df``
    drops hapax noise; ``max_df_ratio`` drops stopword-grade terms whose
    posting lists are the scale hazard (a stopword's postings at corpus
    scale are the corpus itself).

    Scale plan: term presence is ``array_distinct`` BEFORE explode (one
    row per (doc, distinct term) — never the token stream); one shuffle
    on the term builds df + postings together. At 100 TB the posting
    arrays of mid-frequency terms are still large — a production layout
    shards them into per-partition delta-encoded segments (the operator's
    per-term array is the logical view the segments concatenate to).
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.where(F.trim(F.col(text_col)) != "")
    n_docs = base.count()
    posts = base.select(F.col(id_col).alias("doc_id"),
                        F.explode(F.array_distinct(toks)).alias("term"))
    idx = posts.groupBy("term").agg(
        F.count("*").alias("df_t"),
        F.sort_array(F.collect_list("doc_id")).alias("postings"))
    return idx.where((F.col("df_t") >= min_df)
                     & (F.col("df_t") <= max_df_ratio * n_docs))


def inverted_index_delta(changelog: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text",
                         seq_col: str = "__seq",
                         op_col: str = "__op") -> DataFrame:
    """One changelog batch's posting deltas: (term, doc_id, seq, sign)
    with sign +1 for terms of entering images (+I/+U) and -1 for terms
    of leaving images (-D/-U before-images carrying the old text). The
    delta is distinct-terms-per-doc grain — never the token stream."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    sign = (F.when(F.col(op_col).isin("+I", "+U"), 1)
            .when(F.col(op_col).isin("-D", "-U"), -1).otherwise(0))
    return (changelog.where(F.trim(F.col(text_col)) != "")
            .select(F.col(id_col).alias("doc_id"),
                    F.col(seq_col).cast("long").alias("seq"),
                    sign.alias("sign"),
                    F.explode(F.array_distinct(toks)).alias("term")))


def merge_posting_state(state: DataFrame | None,
                        delta: DataFrame) -> DataFrame:
    """Fold posting deltas into the (term, doc_id) presence state: the
    LATEST event per (term, doc) wins (LWW on seq; at equal seq a
    negative sign — the -U of a -U/+U pair — loses to the +U). Rows
    whose winning sign is negative stay in state as tombstones are NOT
    needed: they are dropped, since any later re-add carries a higher
    seq. State is (term, doc_id, seq) — key-grain, mergeable, and
    shuffled only at delta size + touched keys."""
    from ..partitioning import merge_presence_state

    return merge_presence_state(state, delta, ["term", "doc_id"])


def posting_state_view(state: DataFrame) -> DataFrame:
    """Materialize the maintained state as the user-facing inverted
    index (term, df_t, postings ascending) — identical to running
    :func:`inverted_index` over the net document set (the maintenance
    invariant, pytest-enforced)."""
    return state.groupBy("term").agg(
        F.count("*").alias("df_t"),
        F.sort_array(F.collect_list("doc_id")).alias("postings"))


def remove_repeated_segments(docs: DataFrame, id_col: str = "doc_id",
                             text_col: str = "text", seg_words: int = 8,
                             max_doc_freq: int = 1) -> DataFrame:
    """Corpus-level boilerplate removal (the CCNet/C4 paragraph-dedup
    discipline, adapted to segment granularity): split every document
    into fixed-width word segments, count how many DISTINCT documents
    each segment occurs in across the whole corpus, drop segments whose
    document frequency exceeds ``max_doc_freq`` (headers, footers,
    licence blurbs, near-dup payloads), and reassemble the surviving
    segments in order. Returns (id, clean_text, n_kept_segs,
    n_dropped_segs) — documents whose every segment is boilerplate
    survive with clean_text = ''.

    Scale shape: segmentation is a map-side array expression (no
    explode until the segment grain, which is ~len/seg_words rows per
    doc); the document-frequency count is ONE partial-agg shuffle on
    the segment hash-grain; the keep-filter is a hash join back on the
    same key; reassembly is one groupBy(id) with an in-group sort over
    tens of elements. No window over the corpus, no global sort —
    every stage is the groupBy/join Spark already does at 100 TB.
    """
    toks = F.split(F.col(text_col), " ")
    nseg = F.ceil(F.size(toks) / F.lit(float(seg_words))).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), nseg - 1),
        lambda i: F.array_join(
            F.slice(toks, i * seg_words + 1, seg_words), " "))
    seg_rows = docs.select(id_col,
                           F.posexplode(segs).alias("seg_idx", "seg"))
    freq = (seg_rows.groupBy("seg")
            .agg(F.countDistinct(id_col).alias("seg_docs")))
    kept = (seg_rows.join(freq, "seg")
            .where(F.col("seg_docs") <= max_doc_freq))
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg_idx", "seg"))),
                lambda s: s["seg"]), " ").alias("clean_text"),
        F.count("*").cast("long").alias("n_kept_segs"))
    totals = seg_rows.groupBy(id_col).agg(
        F.count("*").cast("long").alias("__n_segs"))
    return (totals.join(rebuilt, id_col, "left")
            .select(id_col,
                    F.coalesce("clean_text", F.lit("")).alias("clean_text"),
                    F.coalesce("n_kept_segs", F.lit(0)).cast("long")
                    .alias("n_kept_segs"),
                    (F.col("__n_segs")
                     - F.coalesce("n_kept_segs", F.lit(0))).cast("long")
                    .alias("n_dropped_segs")))


def train_bpe_merges(df: DataFrame, rounds: int = 3,
                     text_col: str = "text",
                     return_symbols: bool = False):
    """Train ``rounds`` BPE merges (the actual iterative trainer, not
    just one pair-count pass): each round picks the globally most
    frequent adjacent symbol pair (ties broken lexicographically) and
    applies it with EXACT greedy left-to-right non-overlapping
    semantics, then recounts. Returns the merge table
    (round, left_sym, right_sym, pair_freq) — the artifact a tokenizer
    ships.

    The greedy-application subtlety: in a run like "aaa", pair (a,a)
    must merge positions 1-2 but NOT 2-3 (position 2 is consumed).
    Sequential scan semantics are recovered relationally: candidate
    positions form islands of consecutive pos (only possible when
    left==right), and within an island exactly the even offsets merge —
    an alternation computable with two windows, no recursion, identical
    in any SQL engine (which is what makes the trainer oracle-checkable).

    Scale plan: the ONLY corpus-sized operation is the explode+count
    collapse to the distinct-word vocabulary (Zipf: MBs at 100 TB, with
    map-side partial agg). All ``rounds`` iterations run on the vocab
    symbol grain — windows partitioned by word over <=word-length rows,
    pair stats are KB-sized, and the chosen pair broadcasts back.
    Per-round localCheckpoint keeps the lazy plan from doubling
    (dup_clusters/pagerank discipline)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    vocab = (df.where(F.trim(F.col(text_col)) != "")
             .select(F.explode(toks).alias("word"))
             .groupBy("word").agg(F.count("*").alias("wfreq")))
    cur = (vocab.select(
        "word", "wfreq",
        F.explode(F.sequence(F.lit(1), F.length("word"))).alias("pos"))
        .withColumn("sym", F.expr("substring(word, pos, 1)"))
        .transform(pin))

    spark = df.sparkSession
    merge_rows = None
    for r in range(1, rounds + 1):
        wnext = Window.partitionBy("word").orderBy("pos")
        wn = cur.withColumn("nxt", F.lead("sym").over(wnext))
        pf = (wn.where(F.col("nxt").isNotNull())
              .groupBy(F.col("sym").alias("a"), F.col("nxt").alias("b"))
              .agg(F.sum("wfreq").alias("freq")))
        best = (pf.orderBy(F.col("freq").desc(), "a", "b").limit(1)
                .transform(pin))
        row = best.select(F.lit(r).alias("round"),
                          F.col("a").alias("left_sym"),
                          F.col("b").alias("right_sym"),
                          F.col("freq").cast("long").alias("pair_freq"))
        merge_rows = row if merge_rows is None \
            else merge_rows.unionByName(row)

        j = wn.crossJoin(F.broadcast(best))
        cands = (j.where((F.col("sym") == F.col("a"))
                         & (F.col("nxt") == F.col("b")))
                 .withColumn("__rn", F.row_number().over(wnext))
                 .withColumn("__island", F.col("pos") - F.col("__rn")))
        wisl = Window.partitionBy("word", "__island")
        keep = (cands.withColumn(
            "__off", F.col("pos") - F.min("pos").over(wisl))
            .where(F.col("__off") % 2 == 0)
            .select("word", "pos", F.lit(True).alias("__merge_here")))
        skip = keep.select("word", (F.col("pos") + 1).alias("pos"),
                           F.lit(True).alias("__skip"))
        nxt = (j.join(keep, ["word", "pos"], "left")
               .join(skip.select("word", "pos", "__skip"),
                     ["word", "pos"], "left")
               .where(F.col("__skip").isNull())
               .select("word", "wfreq", "pos",
                       F.when(F.col("__merge_here"),
                              F.concat("sym", "nxt"))
                       .otherwise(F.col("sym")).alias("sym")))
        cur = (nxt.withColumn(
            "pos", F.row_number().over(
                Window.partitionBy("word").orderBy("pos")))
            .transform(pin))
    if return_symbols:
        # final (word, wfreq, pos, sym) table — the applied tokenizer
        # state, for encoding (symbols per word under the trained
        # merges)
        return merge_rows, cur
    return merge_rows


def remove_duplicated_spans(docs: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text",
                            span_words: int = 8) -> DataFrame:
    """Token-level cross-document repeated-span removal — the
    exact-substring dedup discipline (dedup spans >= N tokens that
    occur in more than one document), finer-grained than
    :func:`remove_repeated_segments`'s fixed segment grid: a duplicated
    passage is caught at ANY alignment because every sliding
    ``span_words``-gram is tested, and exactly the covered tokens are
    dropped (a token survives unless SOME duplicated gram covers it).

    Relational encoding of the suffix-scan: per document,
    (1) grams via ``lead`` windows (no self-joins, no array explode of
    windows); (2) one partial-agg shuffle on the gram counts distinct
    documents — the only corpus-wide exchange, at the deduplicated gram
    grain; (3) a doc-local trailing-window MAX marks every token within
    ``span_words`` of a duplicated gram start; (4) reassembly of the
    survivors in order. At 100 TB the token-grain frames are large but
    strictly linear, windows are per-document (no global sort), and the
    gram table collapses map-side. Returns (id, clean_text,
    n_tokens, n_removed)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = (docs.where(F.trim(F.col(text_col)) != "")
            .select(id_col, F.posexplode(toks).alias("pos", "tok")))
    w = Window.partitionBy(id_col).orderBy("pos")
    gram_parts = [F.col("tok")] + [F.lead("tok", i).over(w)
                                   for i in range(1, span_words)]
    last = F.lead("tok", span_words - 1).over(w)
    g = base.withColumn(
        "gram", F.when(last.isNotNull(),
                       F.concat_ws(" ", *gram_parts)))
    dup = (g.where(F.col("gram").isNotNull())
           .groupBy("gram")
           .agg(F.countDistinct(id_col).alias("__nd"))
           .where(F.col("__nd") > 1)
           .select("gram", F.lit(1).alias("__dup")))
    marked = (g.join(dup, "gram", "left")
              .withColumn("__m", F.coalesce("__dup", F.lit(0))))
    wcov = (Window.partitionBy(id_col).orderBy("pos")
            .rowsBetween(-(span_words - 1), 0))
    cov = marked.withColumn("__covered",
                            F.max("__m").over(wcov) == 1)
    return (cov.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(
                    F.when(~F.col("__covered"),
                           F.struct("pos", "tok")))),
                lambda s: s["tok"]), " ").alias("clean_text"),
        F.count("*").cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("__covered"), 1).otherwise(0)).cast("long")
        .alias("n_removed")))


def bpe_token_counts(df: DataFrame, rounds: int = 3,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Tokenizer lifecycle completed: TRAIN ``rounds`` BPE merges on
    the corpus, then ENCODE it — per-document subword token counts
    under the trained merges. Encoding is free given training: the
    trainer's final vocab symbol table already IS every word's subword
    segmentation, so counting tokens = symbols-per-word joined back to
    the corpus words (one vocab-grain aggregate + the corpus word
    count, no re-scan of text beyond the word explode). The budget
    number every dataset-mixture/packing decision needs, with the
    actual trained tokenizer rather than a whitespace proxy."""
    _, syms = train_bpe_merges(df, rounds=rounds, text_col=text_col,
                               return_symbols=True)
    per_word = syms.groupBy("word").agg(
        F.count("*").cast("long").alias("__n_sym"))
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    words = (df.where(F.trim(F.col(text_col)) != "")
             .select(id_col, F.explode(toks).alias("word")))
    return (words.join(per_word, "word")
            .groupBy(id_col)
            .agg(F.sum("__n_sym").cast("long").alias("n_bpe_tokens")))


#: GPT-2-style pretokenizer pattern, restricted to constructs RE2 and
#: Java regex agree on (no lookarounds): contractions, space-prefixed
#: letter runs, space-prefixed digit runs, space-prefixed punctuation
#: runs, residual whitespace.
PRETOKEN_PATTERN = (r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+"
                    r"| ?[^A-Za-z0-9\s']+|\s+")


def pretokenize_counts(df: DataFrame, text_col: str = "text",
                       top: int = 50) -> DataFrame:
    """Token-TYPE frequency table under a BPE-ish pretokenizer regex —
    the corpus statistic a tokenizer-training run starts from (and the
    honest 'how many tokens is this corpus' count, versus whitespace
    splitting which undercounts punctuation and numbers).

    regexp_extract_all runs in whole-stage codegen; the explode feeds
    ONE partial-aggregating groupBy, so the shuffle carries one row
    per distinct token type per task — vocabulary-sized, not
    corpus-sized. Top-``top`` by (count DESC, token ASC) via
    TakeOrderedAndProject (a heap, never a global sort). Whitespace-
    only tokens are folded out after counting so the type table stays
    text-bearing. Returns (token, n) rows."""
    toks = df.select(F.explode(F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(PRETOKEN_PATTERN), 0))
        .alias("token"))
    per = (toks.where(F.trim("token") != "")
           .groupBy("token").agg(F.count("*").cast("long").alias("n")))
    return per.orderBy(F.col("n").desc(), "token").limit(top)


#: RAKE stopword breaker: candidate phrases are the maximal runs of
#: text BETWEEN stopwords/punctuation. Restricted to regex constructs
#: Java regex and RE2 (the DuckDB oracle) agree on.
RAKE_BREAK_PATTERN = (
    r"(?:\b(?:the|and|of|to|in|a|an|is|are|was|were|for|on|with|as|by"
    r"|at|or|it|its|this|that|from|be|has|have|had)\b|[^a-z0-9 ])+")


def rake_keywords(df: DataFrame, text_col: str = "text",
                  top: int = 20, min_words: int = 2,
                  max_words: int = 4) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010), corpus-level:
    candidate phrases = maximal stopword-free word runs; word score =
    degree/frequency over phrase co-occurrence; phrase score = sum of
    its word scores. Returns the ``top`` phrases by
    (score DESC, phrase ASC) with their corpus frequency.

    Scale shape: two explodes and two partial-aggregating groupBys —
    word stats collapse to vocabulary size, phrase stats to distinct-
    phrase size, and the word-score join back onto phrase words is a
    broadcast (vocabulary-sized right side). The phrase split is one
    codegen regexp; nothing row-at-a-time. Scores are exact rationals
    rounded at 6 decimals so the ranking is engine-stable."""
    phrases = (df.select(F.explode(F.split(
        F.lower(F.col(text_col)), RAKE_BREAK_PATTERN)).alias("raw"))
        .select(F.trim(F.col("raw")).alias("phrase"))
        .where(F.col("phrase") != ""))
    ph = phrases.withColumn("words", F.split("phrase", " +")).where(
        (F.size("words") >= min_words) & (F.size("words") <= max_words))
    ph_freq = ph.groupBy("phrase", "words").agg(
        F.count("*").cast("long").alias("n"))
    # word stats over phrase occurrences: freq = occurrences, degree =
    # sum of phrase lengths it appears in (co-occurrence degree + self)
    wstats = (ph_freq.select(
        F.explode("words").alias("word"),
        F.col("n"), F.size("words").alias("plen"))
        .groupBy("word")
        .agg(F.sum("n").alias("freq"),
             F.sum(F.col("n") * F.col("plen")).alias("degree")))
    wscore = wstats.select(
        "word", (F.col("degree") / F.col("freq")).alias("wscore"))
    scored = (ph_freq.select("phrase", "n",
                             F.explode("words").alias("word"))
              .join(F.broadcast(wscore), "word")
              .groupBy("phrase", "n")
              .agg(F.round(F.sum("wscore"), 6).alias("score")))
    return (scored.orderBy(F.col("score").desc(), F.col("phrase"))
            .limit(top)
            .select("phrase", F.col("n"), "score"))


def pmi_collocations(df: DataFrame, text_col: str = "text",
                     min_count: int = 10, top: int = 30) -> DataFrame:
    """Pointwise-mutual-information collocation mining over adjacent
    token pairs — the classic phrase-detection statistic (word2vec's
    phrase pass, NPMI corpus profiling). Returns the ``top`` pairs by
    (pmi DESC, w1, w2) with their counts.

    PMI = ln(p(w1,w2) / (p(w1) p(w2))) computed from exact integer
    counts; the only doubles are one division + one ln at the end, with
    the operand order fixed so both engines evaluate the identical
    expression (rounded at 6). Scale shape: the pair stream collapses
    map-side into ONE partial-agg groupBy at distinct-bigram grain;
    unigram counts are vocabulary-sized; the corpus totals ride as a
    broadcast 1-row aggregate. No driver collect, no UDF."""
    words = F.filter(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
                     lambda x: x != "")
    toks = df.select(words.alias("w"))
    # adjacent pairs via arrays_zip of two slices — constructor
    # expressions, NOT an interpreted transform(sequence) lambda: the
    # lambda variant evaluated per element and dominated wall time at
    # 10x sf0.1 (25M pairs: 14.6s -> 4s after this rewrite)
    pairs = (toks.where(F.size("w") >= 2)
             .select(F.explode(F.arrays_zip(
                 F.slice("w", 1, F.size("w") - 1),
                 F.expr("slice(w, 2, size(w) - 1)"))).alias("s"))
             .select(F.col("s.0").alias("w1"),
                     F.col("s.1").alias("w2")))
    bg = pairs.groupBy("w1", "w2").agg(
        F.count("*").cast("long").alias("c12"))
    uni = (toks.select(F.explode("w").alias("word"))
           .groupBy("word").agg(F.count("*").cast("long").alias("c")))
    totals = (bg.agg(F.sum("c12").alias("np"))
              .crossJoin(uni.agg(F.sum("c").alias("nu"))))
    c1 = uni.select(F.col("word").alias("w1"), F.col("c").alias("c1"))
    c2 = uni.select(F.col("word").alias("w2"), F.col("c").alias("c2"))
    scored = (bg.where(F.col("c12") >= min_count)
              .join(F.broadcast(c1), "w1").join(F.broadcast(c2), "w2")
              .crossJoin(F.broadcast(totals))
              .select(
                  "w1", "w2", "c12",
                  F.round(F.log(
                      (F.col("c12").cast("double") * F.col("nu")
                       * F.col("nu"))
                      / (F.col("c1").cast("double") * F.col("c2")
                         * F.col("np"))), 6).alias("pmi")))
    return scored.orderBy(F.col("pmi").desc(), "w1", "w2").limit(top)


def zipf_slope(df: DataFrame, text_col: str = "text",
               top_ranks: int = 200) -> DataFrame:
    """Zipf-law exponent of the corpus token-frequency distribution:
    OLS slope of ln(freq) on ln(rank) over the ``top_ranks`` most
    frequent tokens — the one-number diagnostic for scraped-corpus
    health (natural text ~ -1; templated/boilerplate corpora deviate
    hard). Returns ONE row (n, slope, intercept, r2).

    Same distributed shape as features.ols_fit: the token count table
    collapses in one partial-agg shuffle (vocabulary-sized), the top-N
    rank table is a TakeOrderedAndProject heap, and the fit reduces to
    5 sufficient statistics accumulated in DECIMAL (order-independent)
    with only the final Cramer arithmetic in doubles, rounded at 6."""
    words = F.filter(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
                     lambda x: x != "")
    uni = (df.select(words.alias("w"))
           .select(F.explode("w").alias("word"))
           .groupBy("word").agg(F.count("*").cast("long").alias("freq")))
    ranked = (uni.orderBy(F.col("freq").desc(), "word")
              .limit(top_ranks)
              .withColumn("rank", F.row_number().over(
                  Window.orderBy(F.col("freq").desc(), F.col("word")))))
    xy = ranked.select(
        F.log(F.col("rank").cast("double")).cast("decimal(18,12)")
        .alias("x"),
        F.log(F.col("freq").cast("double")).cast("decimal(18,12)")
        .alias("y"))
    s = xy.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"))
    c = {k: F.col(k).cast("double")
         for k in ("n", "sx", "sy", "sxx", "sxy", "syy")}
    slope = ((c["n"] * c["sxy"] - c["sx"] * c["sy"])
             / (c["n"] * c["sxx"] - c["sx"] * c["sx"]))
    intercept = (c["sy"] - slope * c["sx"]) / c["n"]
    sse = (c["syy"] - intercept * c["sy"] - slope * c["sxy"])
    sst = c["syy"] - c["sy"] * c["sy"] / c["n"]
    r2 = F.lit(1.0) - sse / sst
    return s.select(
        F.col("n").cast("long").alias("n"),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"))


def mine_hard_negatives(docs: DataFrame, query_ids, n_terms: int = 3,
                        n_neg: int = 5, id_col: str = "doc_id",
                        text_col: str = "text",
                        source_col: str = "source") -> DataFrame:
    """Hard-negative mining for retrieval/embedding training: for each
    query document, score the corpus by BM25 over the query's most
    distinctive terms and keep the top lexically-similar documents that
    are NOT positives (same ``source_col``) — the negatives that teach
    a contrastive model the hardest distinctions (random negatives are
    trivially separable; lexically-close non-relevant ones are the
    signal, cf. DPR/ANCE training-data prep).

    Scale shape: query term sets are tiny (queries x n_terms) and
    broadcast; the posting filter is one explode + broadcast semi-join
    so only matching (doc, term) postings shuffle; per-query ranking is
    a window at candidate grain. Returns (query_id, neg_id, score,
    rank)."""
    words = F.filter(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
                     lambda x: x != "")
    base = docs.select(F.col(id_col).alias("id"),
                       F.col(source_col).alias("src"),
                       words.alias("w"))
    base = base.withColumn("dl", F.size("w"))
    stats = base.agg(F.count("*").alias("n"),
                     F.avg("dl").alias("avgdl"))
    toks = base.select("id", "dl", F.explode("w").alias("term"))
    tf = toks.groupBy("id", "dl", "term").agg(
        F.count("*").cast("long").alias("tf"))

    # per-query distinctive terms: top n_terms by (tf DESC, term ASC)
    qtf = tf.where(F.col("id").isin(list(query_ids)))
    wq = Window.partitionBy("id").orderBy(F.col("tf").desc(),
                                          F.col("term").asc())
    qterms = (qtf.withColumn("__r", F.row_number().over(wq))
              .where(F.col("__r") <= n_terms)
              .select(F.col("id").alias("query_id"), "term"))

    dfreq = (tf.join(F.broadcast(qterms.select("term").distinct()),
                     "term")
             .groupBy("term")
             .agg(F.count_distinct("id").alias("df_t")))
    idf = F.log(1.0 + (F.col("n") - F.col("df_t") + 0.5)
                / (F.col("df_t") + 0.5))
    tfn = (F.col("tf") * 2.2
           / (F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("dl")
                                   / F.col("avgdl"))))
    scored = (tf.join(F.broadcast(qterms), "term")
              .join(F.broadcast(dfreq), "term")
              .crossJoin(F.broadcast(stats))
              .groupBy("query_id", "id")
              .agg(F.round(F.sum(idf * tfn), 6).alias("score")))
    qsrc = base.select(F.col("id").alias("query_id"),
                       F.col("src").alias("qsrc"))
    cand = (scored
            .join(F.broadcast(qsrc), "query_id")
            .join(base.select("id", "src"), "id")
            .where((F.col("src") != F.col("qsrc"))
                   & (F.col("id") != F.col("query_id"))))
    wr = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("id").asc())
    return (cand.withColumn("rank", F.row_number().over(wr))
            .where(F.col("rank") <= n_neg)
            .select("query_id", F.col("id").alias("neg_id"),
                    "score", "rank"))


def normalize_unicode(df: DataFrame, text_col: str = "text",
                      out_col: str = "clean_text") -> DataFrame:
    """Canonical text cleanup for a training corpus: Unicode NFC
    composition, control characters stripped to spaces, runs of
    whitespace collapsed, edges trimmed — the normalization gate that
    makes content-hash dedup and tokenization stable across sources
    that encode the same text differently (combining marks vs
    precomposed, stray \\x00..\\x1f from scraped HTML).

    NFC is the one step Catalyst cannot express, so it runs as an
    Arrow-vectorized pandas UDF (one Python hop per batch, not per
    row); the regex passes stay JVM-side in whole-stage codegen. The
    pipeline is embarrassingly parallel — no shuffle, no state — so it
    scales linearly with input splits at 100 TB."""
    from pyspark.sql.functions import pandas_udf

    def _nfc(s):
        import unicodedata

        return s.map(lambda v: unicodedata.normalize("NFC", v)
                     if v is not None else None)

    c = pandas_udf(_nfc, "string")(F.col(text_col))
    c = F.regexp_replace(c, "[\\x00-\\x1f\\x7f]", " ")
    c = F.trim(F.regexp_replace(c, "\\s+", " "))
    return df.withColumn(out_col, c)
