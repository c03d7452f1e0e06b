"""BPE application pinned by hand-computable merge sequences (the
algorithm from Sennrich et al. 2016 — lowest-rank adjacent pair merges
to fixpoint), plus the distributed distinct-word/broadcast-join shape."""

from __future__ import annotations

from cassandra_extractor_spark.operators.bpe import (
    END,
    bpe_encode_word,
    bpe_pieces_for_words,
    bpe_tokenize_corpus,
)

MERGES = [
    ("l", "o"),        # rank 0
    ("lo", "w"),       # rank 1
    ("e", "r"),        # rank 2
    ("er", END),       # rank 3
    ("low", "er</w>"), # rank 4
    ("low", END),      # rank 5
]


def test_encode_word_follows_rank_order():
    # 'low' -> l o w </w> -> (l,o) -> lo w </w> -> (lo,w) -> low </w> -> low</w>
    assert bpe_encode_word("low", {p: i for i, p in enumerate(MERGES)}) == ["low</w>"]
    # 'lower' -> ... -> low + er</w> -> lower</w> via rank 4
    assert bpe_encode_word("lower", {p: i for i, p in enumerate(MERGES)}) == [
        "lower</w>"
    ]
    # unknown word: only applicable merges fire, rest stay characters
    assert bpe_encode_word("slow", {p: i for i, p in enumerate(MERGES)}) == [
        "s",
        "low</w>",
    ]
    # no merges at all
    assert bpe_encode_word("ab", {}) == ["a", "b", END]


def test_rank_priority_beats_position():
    """(e,r) outranks (r,e) insertion order: with both present, the
    lower rank merges first even when it appears later in the word."""
    merges = [("e", "r"), ("x", "e")]
    ranks = {p: i for i, p in enumerate(merges)}
    # x e r </w>: (e,r) rank 0 fires before (x,e) rank 1 -> x er </w>
    assert bpe_encode_word("xer", ranks) == ["x", "er", END]


def test_corpus_tokenize_distinct_word_shape(spark):
    docs = spark.createDataFrame(
        [(1, "low lower low"), (2, "slow low")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in bpe_tokenize_corpus(docs, MERGES).collect()}
    assert out[1]["pieces"] == ["low</w>", "lower</w>", "low</w>"]
    assert out[1]["n_pieces"] == 3
    assert out[2]["pieces"] == ["s", "low</w>", "low</w>"]
    # the Python stage sees DISTINCT words only
    words = spark.createDataFrame([("low",), ("low",), ("lower",)], "word: string")
    enc = bpe_pieces_for_words(words.distinct(), MERGES).collect()
    assert len(enc) == 2


def test_null_and_empty_text_docs_survive(spark):
    """NULL-text docs must appear with empty pieces, not vanish
    (review finding: posexplode drops them)."""
    docs = spark.createDataFrame(
        [(1, "low"), (2, None)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in bpe_tokenize_corpus(docs, MERGES).collect()}
    assert set(out) == {1, 2}
    assert out[2]["pieces"] == [] and out[2]["n_pieces"] == 0
