"""Byte-pair-encoding tokenization as a distributed operator.

Real BPE (Sennrich et al. 2016; the GPT-2 tokenizer family's merge
procedure): a word starts as characters + ``</w>``, then the
lowest-rank adjacent pair present merges, repeated to fixpoint.  The
merge table is the public artifact every BPE tokenizer ships
(``merges.txt``); this module applies one, it does not train one.

Scale shape — the standard two-level spelling:
- The corpus tokenizes DISTINCT words only (``groupBy word`` is a
  map-side-combined agg; natural-language word frequency is Zipfian, so
  distinct words are orders of magnitude fewer than word occurrences).
- The merge table broadcasts to executors once (Spark broadcast var),
  and the per-word merge loop runs in an Arrow-batched ``mapInPandas``
  over the distinct-word frame — the only Python in the plan, sized by
  vocabulary, not corpus.
- Piece arrays broadcast-join back onto the word stream; per-document
  reconstruction is an ordered flatten bounded by document length.

No SQL oracle (the iterative merge loop is not SQL-expressible) — the
algorithm is pinned by hand-computable merge sequences in
``tests/test_bpe.py`` instead, so it stays a library operator rather
than a registry entry.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F, types as T

END = "</w>"


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply BPE merges to one word (driver/executor-side pure
    function)."""
    pieces = list(word) + [END]
    while len(pieces) > 1:
        best_rank, best_i = None, None
        for i in range(len(pieces) - 1):
            r = ranks.get((pieces[i], pieces[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        merged = pieces[best_i] + pieces[best_i + 1]
        # merge ALL occurrences of the chosen pair, left to right
        out, i = [], 0
        while i < len(pieces):
            if (
                i < len(pieces) - 1
                and pieces[i] + pieces[i + 1] == merged
                and ranks.get((pieces[i], pieces[i + 1])) == best_rank
            ):
                out.append(merged)
                i += 2
            else:
                out.append(pieces[i])
                i += 1
        pieces = out
    return pieces


_WORD_PIECES_SCHEMA = T.StructType(
    [
        T.StructField("word", T.StringType()),
        T.StructField("pieces", T.ArrayType(T.StringType())),
    ]
)


def bpe_pieces_for_words(
    words: DataFrame, merges: list[tuple[str, str]], word_col: str = "word"
) -> DataFrame:
    """(word, pieces) for a DISTINCT-word frame; merge ranks ride a
    Spark broadcast variable into an Arrow-batched ``mapInPandas``."""
    sc = words.sparkSession.sparkContext
    ranks_bc = sc.broadcast({pair: i for i, pair in enumerate(merges)})

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ranks = ranks_bc.value
        for pdf in batches:
            ws = pdf[word_col].tolist()
            yield pd.DataFrame(
                {"word": ws, "pieces": [bpe_encode_word(w, ranks) for w in ws]}
            )

    return words.select(F.col(word_col)).mapInPandas(
        encode, schema=_WORD_PIECES_SCHEMA
    )


def bpe_tokenize_corpus(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: Column | None = None,
) -> DataFrame:
    """(doc_id, pieces, n_pieces): BPE-tokenize every document.

    Vocabulary-sized Python, corpus-sized JVM: word stream →
    distinct-word BPE (``bpe_pieces_for_words``) → broadcast join back
    → ordered per-doc flatten (``sort_array(collect_list(struct(pos,
    pieces)))`` then ``flatten`` — buffer bounded by one document).
    """
    from cassandra_extractor_spark.operators.text import tokens

    toks = tokens_col if tokens_col is not None else tokens(F.col(text_col))
    stream = docs.select(
        F.col(id_col).alias("doc_id"),
        # _outer: a NULL/empty text must still yield an output row
        # (empty pieces), not silently vanish from the corpus
        F.posexplode_outer(toks).alias("pos", "word"),
    )
    distinct_words = stream.select("word").where(F.col("word").isNotNull()).distinct()
    pieces = bpe_pieces_for_words(distinct_words, merges)
    joined = stream.join(F.broadcast(pieces), "word", "left")
    per_doc = joined.groupBy("doc_id").agg(
        F.flatten(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "pieces"))),
                lambda s: F.coalesce(s["pieces"], F.array().cast("array<string>")),
            )
        ).alias("pieces")
    )
    return per_doc.select(
        "doc_id", "pieces", F.size("pieces").cast("long").alias("n_pieces")
    ).orderBy("doc_id")
