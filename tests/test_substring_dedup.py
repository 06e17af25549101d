"""Unit + differential pins for exact substring dedup (Lee et al. 2022
semantics: maximal spans whose every k-gram occurs >= 2 times corpus-wide,
within- OR cross-document)."""

from __future__ import annotations

import random
import sys

sys.path.insert(0, "/root/repo")

from sdc_spark.operators.dedup import (
    repeated_substring_spans,
    substring_contamination_spans,
    substring_decontaminate,
    substring_dedup_rewrite,
)


def _brute_spans(
    texts: dict[int, str], k: int, keep_first: bool = False
) -> set[tuple[int, int, int]]:
    """Reference implementation: count every k-gram occurrence, mark
    positions (minus the global argmin occurrence in keep_first mode),
    merge overlapping/adjacent [pos, pos+k-1] windows."""
    counts: dict[str, int] = {}
    first: dict[str, tuple[int, int]] = {}
    for doc in sorted(texts):
        t = texts[doc]
        for i in range(len(t) - k + 1):
            g = t[i : i + k]
            counts[g] = counts.get(g, 0) + 1
            if g not in first or (doc, i + 1) < first[g]:
                first[g] = (doc, i + 1)
    spans = set()
    for doc, t in texts.items():
        marked = [
            i + 1  # 1-based
            for i in range(len(t) - k + 1)
            if counts[t[i : i + k]] >= 2
            and not (keep_first and first[t[i : i + k]] == (doc, i + 1))
        ]
        run: list[int] = []
        for p in marked:
            if run and p > run[-1] + k:
                spans.add((doc, run[0], run[-1] + k - 1))
                run = []
            run.append(p)
        if run:
            spans.add((doc, run[0], run[-1] + k - 1))
    return spans


def _spark_spans(spark, texts: dict[int, str], k: int) -> set[tuple[int, int, int]]:
    df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    out = repeated_substring_spans(df, "text", "doc_id", min_len=k)
    return {(r.doc, r.span_start, r.span_end) for r in out.collect()}


def test_cross_doc_shared_passage(spark):
    shared = "The quick brown fox jumps over the lazy dog near the riverbank."
    texts = {
        1: "AAA " + shared + " tail one.",
        2: "Different opening here, then " + shared + " more.",
        3: "entirely unique prose with no repetition of anything at all....",
    }
    got = _spark_spans(spark, texts, 50)
    assert got == _brute_spans(texts, 50)
    assert {d for d, _, _ in got} == {1, 2}


def test_within_doc_repeat_and_short_docs(spark):
    texts = {
        1: ("xy" * 40) + " MID " + ("xy" * 40),  # within-doc repeat
        2: "short",  # below k: no positions at all
    }
    k = 20
    got = _spark_spans(spark, texts, k)
    assert got == _brute_spans(texts, k)
    # the two 80-char xy-blocks are each fully covered (self-repeating)
    assert any(d == 1 and a == 1 for d, a, _ in got)


def test_multibyte_positions_are_char_based(spark):
    shared = "héllo wörld ünïcode paragraph shared vérbatim across docs"
    texts = {1: "ä " + shared + " €nd", 2: shared + " ... östlich"}
    k = 30
    got = _spark_spans(spark, texts, k)
    assert got == _brute_spans(texts, k)


def test_differential_random_corpora(spark):
    rng = random.Random(20260815)
    for trial in range(3):
        # small alphabet so repeats actually occur
        mk = lambda n: "".join(rng.choice("abc ") for _ in range(n))
        boiler = mk(30)
        texts = {}
        for d in range(8):
            t = mk(rng.randint(0, 60))
            if d % 2 == 0:
                cut = rng.randint(0, len(t))
                t = t[:cut] + boiler + t[cut:]
            texts[d] = t
        for k in (8, 15):
            assert _spark_spans(spark, texts, k) == _brute_spans(texts, k), (
                trial,
                k,
            )


def test_rewrite_reconstruction(spark):
    shared = "0123456789" * 8  # 80 chars, also self-similar
    texts = {
        1: "head-" + shared + "-tail",
        2: shared,
        3: "clean document with nothing repeated anywhere inside it",
    }
    df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    rows = {
        r.doc: r
        for r in substring_dedup_rewrite(df, "text", "doc_id", min_len=50).collect()
    }
    spans = _brute_spans(texts, 50)
    for doc, t in texts.items():
        r = rows[doc]
        assert len(r.clean_text) == len(t) - r.removed_chars
        doc_spans = sorted((a, b) for d, a, b in spans if d == doc)
        expect = ""
        nxt = 1
        for a, b in doc_spans:
            expect += t[nxt - 1 : a - 1]
            nxt = b + 1
        expect += t[nxt - 1 :]
        assert r.clean_text == expect, doc
        assert r.n_spans == len(doc_spans)
    # doc 2 was one giant duplicated span -> empty, not dropped
    assert rows[2].clean_text == ""
    assert rows[3].clean_text == texts[3]


def test_keep_first_retains_canonical_copy(spark):
    shared = "The quick brown fox jumps over the lazy dog near the riverbank."
    texts = {
        1: "AAA " + shared + " tail one.",
        2: "Different opening here, then " + shared + " more.",
        3: "Third containing " + shared + " too, late in doc order.",
    }
    df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    got = {
        (r.doc, r.span_start, r.span_end)
        for r in repeated_substring_spans(
            df, "text", "doc_id", min_len=50, keep_first=True
        ).collect()
    }
    assert got == _brute_spans(texts, 50, keep_first=True)
    # doc 1 holds the argmin occurrence of every shared gram: untouched
    assert {d for d, _, _ in got} == {2, 3}
    rows = {
        r.doc: r
        for r in substring_dedup_rewrite(
            df, "text", "doc_id", min_len=50, keep_first=True
        ).collect()
    }
    assert rows[1].clean_text == texts[1]
    assert shared not in rows[2].clean_text
    assert shared not in rows[3].clean_text


def test_keep_first_differential_random(spark):
    rng = random.Random(101)
    mk = lambda n: "".join(rng.choice("ab ") for _ in range(n))
    boiler = mk(25)
    texts = {d: mk(rng.randint(0, 50)) + (boiler if d % 2 else "") for d in range(6)}
    df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    for k in (8, 12):
        got = {
            (r.doc, r.span_start, r.span_end)
            for r in repeated_substring_spans(
                df, "text", "doc_id", min_len=k, keep_first=True
            ).collect()
        }
        assert got == _brute_spans(texts, k, keep_first=True), k


def _brute_contamination(
    texts: dict[int, str], bench: list[str], k: int
) -> set[tuple[int, int, int]]:
    bgrams = {b[i : i + k] for b in bench for i in range(len(b) - k + 1)}
    spans = set()
    for doc, t in texts.items():
        marked = [
            i + 1 for i in range(len(t) - k + 1) if t[i : i + k] in bgrams
        ]
        run: list[int] = []
        for p in marked:
            if run and p > run[-1] + k:
                spans.add((doc, run[0], run[-1] + k - 1))
                run = []
            run.append(p)
        if run:
            spans.add((doc, run[0], run[-1] + k - 1))
    return spans


def test_contamination_spans_and_decontaminate(spark):
    leak = "What is the capital of Freedonia? Answer: Fredville, founded 1888."
    texts = {
        1: "intro text here. " + leak + " trailing commentary.",
        2: "totally clean document with enough length to have grams in it...",
        3: leak,  # the whole doc is the benchmark item
    }
    bench = [leak, "Another benchmark question that no document quotes at all?"]
    df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    bdf = spark.createDataFrame([(b,) for b in bench], ["q"])
    k = 40
    got = {
        (r.doc, r.span_start, r.span_end)
        for r in substring_contamination_spans(
            df, bdf, "text", "doc_id", "q", min_len=k
        ).collect()
    }
    assert got == _brute_contamination(texts, bench, k)
    assert {d for d, _, _ in got} == {1, 3}
    rows = {
        r.doc: r
        for r in substring_decontaminate(
            df, bdf, "text", "doc_id", "q", min_len=k
        ).collect()
    }
    assert leak not in rows[1].clean_text
    assert "intro text here." in rows[1].clean_text
    assert "trailing commentary." in rows[1].clean_text
    assert rows[2].clean_text == texts[2]
    assert rows[3].clean_text == ""  # fully-leaked doc -> empty, not dropped
    for doc, t in texts.items():
        assert len(rows[doc].clean_text) == len(t) - rows[doc].removed_chars


def test_contamination_differential_random(spark):
    rng = random.Random(77)
    mk = lambda n: "".join(rng.choice("abcd ") for _ in range(n))
    bench = [mk(40), mk(35)]
    texts = {}
    for d in range(6):
        t = mk(rng.randint(0, 50))
        if d % 2 == 0:
            b = bench[d % len(bench)]
            cut = rng.randint(0, len(t))
            t = t[:cut] + b[5:30] + t[cut:]  # partial benchmark slice
        texts[d] = t
    df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    bdf = spark.createDataFrame([(b,) for b in bench], ["q"])
    for k in (8, 14):
        got = {
            (r.doc, r.span_start, r.span_end)
            for r in substring_contamination_spans(
                df, bdf, "text", "doc_id", "q", min_len=k
            ).collect()
        }
        assert got == _brute_contamination(texts, bench, k), k


def test_persisted_index_screen_equals_full_run(spark):
    from sdc_spark.operators.dedup import (
        append_substring_index,
        compact_substring_index,
        drop_substring_index,
        screen_substrings_against_index,
        write_substring_index,
    )

    rng = random.Random(999)
    mk = lambda n: "".join(rng.choice("abc ") for _ in range(n))
    boiler = mk(30)
    texts = {d: mk(rng.randint(10, 50)) + (boiler if d % 3 == 0 else "") for d in range(12)}
    corpus = {d: t for d, t in texts.items() if d < 8}
    batch = {d: t for d, t in texts.items() if d >= 8}
    k = 10
    name = "subidx_unittest"
    drop_substring_index(spark, name)
    cdf = spark.createDataFrame(list(corpus.items()), ["doc_id", "text"])
    bdf = spark.createDataFrame(list(batch.items()), ["doc_id", "text"])
    write_substring_index(spark, cdf, "text", "doc_id", name, min_len=k)

    def screen() -> set:
        return {
            (r.doc, r.span_start, r.span_end)
            for r in screen_substrings_against_index(
                spark, bdf, "text", "doc_id", name, min_len=k
            ).collect()
        }

    # full-run truth: spans over corpus ∪ batch restricted to batch docs
    expect = {s for s in _brute_spans(texts, k) if s[0] >= 8}
    assert screen() == expect

    # append the batch, re-screen a second batch against corpus ∪ batch
    append_substring_index(spark, bdf, "text", "doc_id", name, min_len=k)
    spark.catalog.refreshTable(f"sub_grams_{name}")
    batch2 = {100: boiler + " fresh tail", 101: mk(40)}
    b2 = spark.createDataFrame(list(batch2.items()), ["doc_id", "text"])
    all_texts = {**texts, **batch2}
    expect2 = {
        s for s in _brute_spans(all_texts, k) if s[0] >= 100
    }
    got2 = {
        (r.doc, r.span_start, r.span_end)
        for r in screen_substrings_against_index(
            spark, b2, "text", "doc_id", name, min_len=k
        ).collect()
    }
    assert got2 == expect2

    # compaction dedups cross-append hashes and preserves the answer
    compact_substring_index(spark, name)
    spark.catalog.refreshTable(f"sub_grams_{name}")
    got3 = {
        (r.doc, r.span_start, r.span_end)
        for r in screen_substrings_against_index(
            spark, b2, "text", "doc_id", name, min_len=k
        ).collect()
    }
    assert got3 == expect2
    tbl = spark.table(f"sub_grams_{name}")
    assert tbl.count() == tbl.distinct().count()
    drop_substring_index(spark, name)


def test_min_len_validation(spark):
    df = spark.createDataFrame([(1, "abc")], ["doc_id", "text"])
    try:
        repeated_substring_spans(df, "text", "doc_id", min_len=1)
    except ValueError:
        pass
    else:
        raise AssertionError("min_len=1 must raise")


def test_persisted_index_takedown_tombstones(spark, tmp_path_factory):
    """Takedown on the counted-gram index: delete logs NEGATIVE counts —
    O(|batch|) writes, gram files byte-untouched — and a screen after
    the delete equals a full ExactSubstr run over the SURVIVING corpus ∪
    batch (shared grams stay members, sole-owner grams die). Compaction
    then applies the log physically (net-zero grams gone, one row per
    gram) and the answer is unchanged."""
    import glob
    import os

    from pyspark.sql import functions as F

    from sdc_spark.operators.dedup import (
        compact_substring_index,
        delete_from_substring_index,
        drop_substring_index,
        screen_substrings_against_index,
        write_substring_index,
    )

    rng = random.Random(4242)
    mk = lambda n: "".join(rng.choice("abcd ") for _ in range(n))
    boiler = mk(25)  # shared by several corpus docs AND a removed doc
    solo = mk(25)  # exists ONLY in removed docs
    k = 10
    texts = {}
    for d in range(10):
        texts[d] = mk(rng.randint(15, 40)) + (boiler if d % 3 == 0 else "")
    texts[3] = texts[3] + solo  # doc 3 will be removed
    texts[6] = texts[6] + solo[:k - 1]  # shares a sub-threshold prefix only
    corpus = {d: t for d, t in texts.items() if d < 10}
    batch = {100: boiler + " xx " + solo, 101: mk(30)}

    root = str(tmp_path_factory.mktemp("subtomb"))
    name = "subtomb_unittest"
    drop_substring_index(spark, name, path_root=root)
    cdf = spark.createDataFrame(list(corpus.items()), ["doc_id", "text"])
    bdf = spark.createDataFrame(list(batch.items()), ["doc_id", "text"])
    write_substring_index(spark, cdf, "text", "doc_id", name, min_len=k, path_root=root)

    removed = {3}
    rdf = cdf.filter(F.col("doc_id").isin(list(removed)))

    def _files():
        return {
            (f, os.path.getsize(f))
            for f in glob.glob(f"{root}/{name}/grams/*.parquet")
        }

    before_files = _files()
    delete_from_substring_index(
        spark, rdf, "text", "doc_id", name, min_len=k, path_root=root
    )
    assert _files() == before_files  # O(|batch|) write: index untouched

    surviving = {d: t for d, t in corpus.items() if d not in removed}

    def screen() -> set:
        return {
            (r.doc, r.span_start, r.span_end)
            for r in screen_substrings_against_index(
                spark, bdf, "text", "doc_id", name, min_len=k
            ).collect()
        }

    expect = {
        s for s in _brute_spans({**surviving, **batch}, k) if s[0] >= 100
    }
    assert screen() == expect
    # the boiler (shared with survivors) must still mark; solo must not
    assert any(s[0] == 100 for s in expect)

    # re-delete of the same doc is a no-op (deldocs guard)
    delete_from_substring_index(
        spark, rdf, "text", "doc_id", name, min_len=k, path_root=root
    )
    assert screen() == expect

    compact_substring_index(spark, name, path_root=root)
    spark.catalog.refreshTable(f"sub_grams_{name}")
    assert not spark.catalog.tableExists(f"sub_dels_{name}")
    assert not spark.catalog.tableExists(f"sub_dead_{name}")
    assert screen() == expect
    tbl = spark.table(f"sub_grams_{name}")
    assert tbl.count() == tbl.select("h").distinct().count()
    assert tbl.filter(F.col("cnt") <= 0).count() == 0
    drop_substring_index(spark, name, path_root=root)
