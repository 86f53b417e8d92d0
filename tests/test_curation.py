"""Curation operators: decontamination, repetition signals, per-domain
caps, sharding, sequence packing — semantics and the determinism
properties that matter for incremental 100 TB pipelines (row fate must
not change when the corpus grows)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from clx_etl_spark.operators import curation as C


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_decontaminate_flags_planted_leak(spark):
    bench = _docs(spark, [(100, "the quick brown fox jumps over the lazy dog", "eval")])
    train = _docs(
        spark,
        [
            (1, "the quick brown fox jumps high today", "web"),  # shares grams
            (2, "completely unrelated words appear in this line", "web"),
        ],
    )
    out = {r.doc_id: r for r in C.decontaminate(train, bench, k=3).collect()}
    assert out[1].n_contaminated >= 2 and out[1].is_contaminated
    assert out[2].n_contaminated == 0 and not out[2].is_contaminated
    # ratio is hits over the doc's own distinct gram count
    assert out[1].overlap_ratio == out[1].n_contaminated / out[1].n_grams


def test_decontaminate_short_docs_dropped(spark):
    bench = _docs(spark, [(9, "a b c", "eval")])
    train = _docs(spark, [(1, "a b", "web")])  # < k tokens -> no grams
    assert C.decontaminate(train, bench, k=3).count() == 0


def test_repetition_signals_spam_vs_clean(spark):
    df = _docs(
        spark,
        [
            (1, "buy buy buy buy", "spam"),
            (2, "all four words differ", "clean"),
            (3, "one", "tiny"),
        ],
    )
    out = {r.doc_id: r for r in C.repetition_signals(df).collect()}
    assert out[1].top_token_ratio == 1.0
    assert out[1].dup_2gram_ratio == pytest.approx(2 / 3)  # 3 grams, 1 distinct
    assert out[2].top_token_ratio == 0.25
    assert out[2].dup_2gram_ratio == 0.0
    assert out[3].n_tokens == 1 and out[3].dup_2gram_ratio is None


def test_cap_per_group_binds_and_is_stable(spark):
    rows = [(i, f"text {i}", f"src{i % 2}") for i in range(40)]
    df = _docs(spark, rows)
    kept = C.cap_per_group(df, "source", cap=5)
    by_src = kept.groupBy("source").count().collect()
    assert all(r["count"] == 5 for r in by_src)
    # growing the corpus never evicts a previously kept row in favor of a
    # worse-ranked one: kept set under cap=5 is a subset of kept under cap=8
    wider = {r.doc_id for r in C.cap_per_group(df, "source", cap=8).collect()}
    assert {r.doc_id for r in kept.collect()} <= wider


def test_shard_assign_stable_under_growth(spark):
    small = _docs(spark, [(i, f"t {i}", "s") for i in range(50)])
    big = _docs(spark, [(i, f"t {i}", "s") for i in range(100)])
    a = dict(C.shard_assign(small, 8).select("doc_id", "shard").collect())
    b = dict(C.shard_assign(big, 8).select("doc_id", "shard").collect())
    assert all(b[k] == v for k, v in a.items())  # no row migrates
    assert set(b.values()) == set(range(8))


def test_pack_sequences_invariants(spark):
    rows = [(i, " ".join(["w"] * (10 + i % 7)), "s") for i in range(200)]
    df = C.shard_assign(_docs(spark, rows), n_shards=4)
    packed = C.pack_sequences(df, budget=64).collect()
    assert all(0 <= r.seq_offset < 64 for r in packed)
    # within a shard, (seq_id, seq_offset) is non-decreasing in doc order
    # and offsets advance by exactly n_tokens (concatenate-then-chunk)
    by_shard: dict[int, list] = {}
    for r in sorted(packed, key=lambda r: (r.shard, r.doc_id)):
        by_shard.setdefault(r.shard, []).append(r)
    for rs in by_shard.values():
        cum = 0
        for r in rs:
            assert r.seq_id == cum // 64 and r.seq_offset == cum % 64
            cum += r.n_tokens


def test_write_shards_layout(spark, tmp_path):
    df = _docs(spark, [(i, f"t {i}", "s") for i in range(64)])
    path = str(tmp_path / "shards")
    C.write_shards(df, path, n_shards=4)
    back = spark.read.parquet(path)
    assert back.count() == 64
    assert back.select("shard").distinct().count() == 4
    # one data file per shard partition (downstream loaders map shard->file)
    import glob

    for s in range(4):
        files = [
            f for f in glob.glob(f"{path}/shard={s}/*") if f.endswith(".parquet")
        ]
        assert len(files) == 1, files
    # assignment matches the stable operator
    expect = dict(C.shard_assign(df, 4).select("doc_id", "shard").collect())
    got = dict(back.select("doc_id", F.col("shard").cast("int")).collect())
    assert got == expect


def test_pack_and_decontam_hypothesis_invariants(spark):
    """Property checks against brute-force Python references: packing
    equals a sequential concatenate-then-chunk simulation for any doc
    mix; decontamination ratio equals the exact set-overlap fraction."""
    from hypothesis import given, settings, strategies as st

    words = st.sampled_from(["a", "b", "c", "d", "e"])
    doc = st.lists(words, min_size=0, max_size=12).map(" ".join)
    corpus = st.lists(doc, min_size=1, max_size=12)

    @settings(max_examples=10, deadline=None)
    @given(corpus)
    def check(texts):
        rows = [(i, t, "s") for i, t in enumerate(texts)]
        df = C.shard_assign(_docs(spark, rows), n_shards=2)
        got = {
            r.doc_id: (r.shard, r.seq_id, r.seq_offset)
            for r in C.pack_sequences(df, budget=7).collect()
        }
        shards = {r.doc_id: r.shard for r in df.select("doc_id", "shard").collect()}
        cum: dict[int, int] = {}
        for i, t in enumerate(texts):  # doc_id order == insertion order
            s = shards[i]
            before = cum.get(s, 0)
            assert got[i] == (s, before // 7, before % 7), (i, t)
            cum[s] = before + len([w for w in t.split(" ") if w])

        bench_rows = [(100 + i, t, "e") for i, t in enumerate(texts[:2])]
        out = C.decontaminate(
            _docs(spark, rows), _docs(spark, bench_rows), k=2
        ).collect()
        grams = lambda t: {
            " ".join(p)
            for p in zip(t.split(), t.split()[1:])
        }
        bg = set().union(*(grams(t) for _, t, _ in bench_rows)) if bench_rows else set()
        for r in out:
            g = grams(texts[r.doc_id])
            assert r.n_grams == len(g)
            assert r.n_contaminated == len(g & bg)

    check()


def test_span_dup_stats_planted_boilerplate(spark):
    """Two docs share an 8-token boilerplate block; a third is unique.
    Partial trailing blocks are excluded from the denominator."""
    boiler = "one two three four five six seven eight"
    df = _docs(
        spark,
        [
            (1, boiler + " unique tail goes here alpha beta gamma delta", "a"),
            (2, boiler + " other ending words entirely different here now", "b"),
            (3, "totally fresh content with no shared runs at all x", "c"),
            (4, "short doc", "d"),  # < 8 tokens -> no blocks, no row
        ],
    )
    out = {r.doc_id: r for r in C.span_dup_stats(df, block_tokens=8).collect()}
    assert out[1].n_blocks == 2 and out[1].n_dup_blocks == 1
    assert out[1].dup_block_ratio == 0.5
    assert out[2].n_dup_blocks == 1
    assert out[3].n_dup_blocks == 0
    assert 4 not in out


def test_remove_duplicate_spans_keeps_first_occurrence(spark):
    """The shared 8-token block survives only in the smallest
    (doc_id, position); later docs lose it but keep their own material
    (including the partial tail)."""
    boiler = "one two three four five six seven eight"
    df = _docs(
        spark,
        [
            (1, boiler + " alpha beta gamma delta epsilon zeta eta theta", "a"),
            (2, boiler + " tail words", "b"),
            (3, "short doc", "c"),
        ],
    )
    out = {r.doc_id: r for r in C.remove_duplicate_spans(df, block_tokens=8).collect()}
    assert out[1].text_clean == boiler + " alpha beta gamma delta epsilon zeta eta theta"
    assert out[1].n_blocks == 2 and out[1].n_kept == 2
    assert out[2].text_clean == "tail words"  # block cut, tail kept
    assert out[2].n_blocks == 1 and out[2].n_kept == 0
    assert out[3].text_clean == "short doc" and out[3].n_blocks == 0


def test_null_and_empty_text_are_empty_docs(spark):
    """NULL text must behave as an empty document (0 tokens / 0 blocks),
    never as NULL stats that poison downstream counts or pack offsets."""
    df = spark.createDataFrame(
        [(1, None, "s"), (2, "", "s"), (3, "a b", "s")],
        "doc_id long, text string, source string",
    )
    rw = {r.doc_id: r for r in C.remove_duplicate_spans(df).collect()}
    assert (rw[1].text_clean, rw[1].n_blocks, rw[1].n_kept) == ("", 0, 0)
    rep = {r.doc_id: r for r in C.repetition_signals(df).collect()}
    assert rep[1].n_tokens == 0 and rep[2].n_tokens == 0
    packed = {r.doc_id: r for r in C.pack_sequences(C.shard_assign(df, 2), 7).collect()}
    assert packed[1].n_tokens == 0 and packed[1].seq_offset == 0


def test_redact_pii_masks_and_counts(spark):
    df = _docs(
        spark,
        [
            (1, "mail a@b.org and c.d@e-f.co twice", "web"),
            (2, "server 10.0.0.1 port open, call +44-555-0199", "web"),
            (3, "nothing sensitive here", "web"),
            (4, None, "web"),  # null text must not crash the regex chain
        ],
    )
    out = {r.doc_id: r for r in C.redact_pii(df).collect()}
    assert out[1].n_email == 2 and out[1].redacted == "mail <EMAIL> and <EMAIL> twice"
    assert out[2].n_ip == 1 and out[2].n_phone == 1
    assert out[2].redacted == "server <IP> port open, call <PHONE>"
    assert out[3].redacted == "nothing sensitive here"
    assert out[3].n_email == out[3].n_ip == out[3].n_phone == 0
    assert out[4].redacted is None


def test_redact_pii_email_domain_not_rematched_as_ip(spark):
    # alphabetic-TLD addresses are ONE <EMAIL> (the dotted domain is
    # consumed by the e-mail pass, never re-matched as a quad); an
    # all-numeric "domain" is not an e-mail by the pattern, so both quads
    # fall through to the IP pass — same behavior in the DuckDB oracle.
    df = _docs(
        spark,
        [
            (1, "x 10.0.0.1@ex.org y", "web"),
            (2, "x 1.2.3.4@5.6.7.8 y", "web"),
        ],
    )
    out = {r.doc_id: r for r in C.redact_pii(df).collect()}
    assert out[1].redacted == "x <EMAIL> y" and out[1].n_email == 1
    assert out[2].redacted == "x <IP>@<IP> y" and out[2].n_ip == 2


def test_chunk_documents_windows_and_edges(spark):
    import pytest as _pytest

    long_text = " ".join(f"w{i}" for i in range(100))
    df = _docs(
        spark,
        [
            (1, long_text, "web"),       # 100 tokens -> starts 0, 48 (96 dropped: > 100-16)
            (2, "a b c", "web"),         # shorter than one window -> 1 chunk
            (3, None, "web"),            # null -> no chunks
            (4, " ".join(f"x{i}" for i in range(64)), "web"),  # exactly one window
        ],
    )
    out = C.chunk_documents(df, chunk_size=64, overlap=16)
    rows = {(r.doc_id, r.chunk_id): r for r in out.collect()}
    assert {(d, c) for d, c in rows} == {(1, 0), (1, 1), (2, 0), (4, 0)}
    assert rows[(1, 0)].n_tokens == 64 and rows[(1, 0)].chunk_text.startswith("w0 w1 ")
    # second window starts at 48 -> 52 remaining tokens
    assert rows[(1, 1)].n_tokens == 52 and rows[(1, 1)].chunk_text.startswith("w48 ")
    # consecutive chunks overlap by exactly `overlap` tokens
    assert rows[(1, 0)].chunk_text.split()[-16:] == rows[(1, 1)].chunk_text.split()[:16]
    assert rows[(2, 0)].n_tokens == 3 and rows[(4, 0)].n_tokens == 64
    with _pytest.raises(ValueError):
        C.chunk_documents(df, chunk_size=16, overlap=16)


def test_chunk_documents_reconstruction_property(spark):
    """For any doc, concatenating chunk 0 with each later chunk minus its
    `overlap`-token prefix reproduces the original token stream exactly —
    chunking loses nothing and duplicates only the declared overlap."""
    from hypothesis import given, settings, strategies as st

    words = st.sampled_from(["a", "bb", "ccc", "dd", "e"])
    doc = st.lists(words, min_size=0, max_size=200).map(" ".join)

    @settings(max_examples=8, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=4))
    def check(texts):
        df = _docs(spark, [(i, t, "s") for i, t in enumerate(texts)])
        out = C.chunk_documents(df, chunk_size=16, overlap=4)
        by_doc: dict[int, list] = {}
        for r in out.collect():
            by_doc.setdefault(r.doc_id, []).append(r)
        for i, t in enumerate(texts):
            toks = [w for w in t.split(" ") if w]
            chunks = sorted(by_doc.get(i, []), key=lambda r: r.chunk_id)
            if not toks:
                assert chunks == []
                continue
            assert [r.chunk_id for r in chunks] == list(range(len(chunks)))
            rebuilt = []
            for j, r in enumerate(chunks):
                cw = r.chunk_text.split(" ") if r.chunk_text else []
                assert len(cw) == r.n_tokens
                rebuilt.extend(cw if j == 0 else cw[4:])
            assert rebuilt == toks, (i, t)

    check()


def test_chunk_and_redact_cross_engine_fuzz(spark):
    """The DuckDB-oracle equivalences hold on adversarial generated data,
    not just the driver parquet: unicode, repeated whitespace, tab/newline
    separators, empty and null docs, and PII-lookalike fragments."""
    import duckdb
    import pandas as pd
    from hypothesis import given, settings, strategies as st

    word = st.one_of(
        st.sampled_from(
            ["a", "bb", "Ω", "naïve", "x1", "a@b.co", "1.2.3.4", "+1-555-0000", "@", "."]
        ),
        st.text(alphabet="ab@.19", min_size=1, max_size=6),
    )
    sep = st.sampled_from([" ", "  ", "\t", "\n"])
    doc = st.lists(st.tuples(word, sep), min_size=0, max_size=40).map(
        lambda ps: "".join(w + s for w, s in ps)
    )

    TOKS = r"list_filter(string_split_regex(text, '\s+'), x -> x <> '')"
    EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"

    @settings(max_examples=6, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=5))
    def check(texts):
        rows = [(i, t, "s") for i, t in enumerate(texts)]
        sdf = _docs(spark, rows)
        con = duckdb.connect()
        con.register(
            "documents", pd.DataFrame(rows, columns=["doc_id", "text", "source"])
        )

        got = sorted(
            (r.doc_id, r.chunk_id, r.n_tokens, r.chunk_text)
            for r in C.chunk_documents(sdf, chunk_size=8, overlap=2).collect()
        )
        want = sorted(
            tuple(r)
            for r in con.execute(
                f"""
            WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
            starts AS (SELECT doc_id, t, unnest(range(0, len(t), 6)) AS s
                       FROM toks WHERE len(t) > 0)
            SELECT doc_id, s // 6, len(list_slice(t, s + 1, s + 8)),
                   array_to_string(list_slice(t, s + 1, s + 8), ' ')
            FROM starts WHERE s = 0 OR s < len(t) - 2
            """
            ).fetchall()
        )
        assert got == want

        red = sorted(
            (r.doc_id, r.n_email, r.redacted)
            for r in C.redact_pii(sdf).collect()
        )
        want_red = sorted(
            tuple(r)
            for r in con.execute(
                f"""
            SELECT doc_id,
                   len(regexp_extract_all(text, '{EMAIL}')),
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(text, '{EMAIL}', '<EMAIL>', 'g'),
                       '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b', '<IP>', 'g'),
                     '\\+\\d{{1,3}}-\\d{{3}}-\\d{{4}}', '<PHONE>', 'g')
            FROM documents
            """
            ).fetchall()
        )
        assert red == want_red

    check()


def test_quality_weighted_sample_growth_stable(spark):
    """A kept row stays kept (and a dropped row dropped) when the corpus
    grows — the property RNG sampling cannot give."""
    from clx_etl_spark.operators.sampling import quality_weighted_sample

    def rated(n):
        rows = [(i, (i * 37) % 1001) for i in range(n)]
        return spark.createDataFrame(rows, "doc_id long, permille long")

    small = {
        r.doc_id
        for r in quality_weighted_sample(rated(100), "doc_id", F.col("permille")).collect()
    }
    big = {
        r.doc_id
        for r in quality_weighted_sample(rated(300), "doc_id", F.col("permille")).collect()
    }
    assert small == {d for d in big if d < 100}
    assert 0 < len(small) < 100  # the gate actually bites both ways


def test_redact_counts_masked_occurrences_not_raw_overlaps(spark):
    """A dotted quad inside an email local-part is ONE email, not also a
    phantom IP: counts are taken on the progressively-masked text."""
    from clx_etl_spark.operators.curation import redact_pii

    df = spark.createDataFrame(
        [(1, "contact 10.0.0.1@ex.org and host 192.168.0.7 now")],
        "doc_id long, text string",
    )
    r = redact_pii(df).collect()[0]
    assert (r.n_email, r.n_ip, r.n_phone) == (1, 1, 0)
    assert r.redacted == "contact <EMAIL> and host <IP> now"
