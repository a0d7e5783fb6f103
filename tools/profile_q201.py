"""Stage-level profile of q201_packed_id_shards (guide §1: measure
first — where do the 15 s go?). Times each stage of the chain in one
fresh session: BPE training, bundle round-trip, id encode, packing,
shard write (incl. manifest read-back), content-verified read, final
projection."""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from big_data_spark.session import get_spark  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("profile-q201")
sc = spark.sparkContext

from pyspark.sql import functions as F  # noqa: E402

from big_data_spark import queries as Q  # noqa: E402
from big_data_spark.operators.chunking import (  # noqa: E402
    pack_sequences,
    read_packed_shards,
    write_packed_shards,
)
from big_data_spark.operators.tokenizer import (  # noqa: E402
    TokenizerBundle,
    bpe_vocab_pieces,
    bpe_word_table,
    encode_corpus_with_bundle,
    load_tokenizer_bundle,
    save_tokenizer_bundle,
    train_bpe,
    with_byte_fallback_pieces,
)

t = {}


def mark(name, t0):
    t[name] = round(time.perf_counter() - t0, 3)
    print(f"{name}: {t[name]}s", flush=True)


t0 = time.perf_counter()
jobs = spark.createDataFrame(
    Q.CAPSTONE_JOBS_DOCS, "doc_id long, source string, text string"
)
docs = (
    Q._t(spark, sf_dir, "documents")
    .select("doc_id", "source", "text")
    .unionAll(jobs)
)
docs.count()
mark("docs_union", t0)

t0 = time.perf_counter()
words = bpe_word_table(docs, token_pattern=Q._BPE_TRAIN_REGEX)
nw = words.count()
mark("word_table_count", t0)
print("  distinct words:", nw)

t0 = time.perf_counter()
merges = train_bpe(words, num_merges=Q._BPE_MERGES)
mark("train_bpe", t0)

t0 = time.perf_counter()
pieces = with_byte_fallback_pieces(bpe_vocab_pieces(words, merges))
mark("vocab_pieces", t0)
print("  pieces:", len(pieces))

t0 = time.perf_counter()
bundle = TokenizerBundle(
    merges=list(merges), pieces=pieces, pre_tokenize=None, oov_fallback="bytes"
)
tmp = tempfile.mkdtemp(prefix="prof_bundle_")
save_tokenizer_bundle(bundle, tmp)
loaded = load_tokenizer_bundle(tmp)
shutil.rmtree(tmp, ignore_errors=True)
mark("bundle_roundtrip", t0)

t0 = time.perf_counter()
enc = encode_corpus_with_bundle(docs, loaded, emit_ids=True)
enc_sel = enc.select("source", "doc_id", "doc_tokens")
mark("encode_plan", t0)

t0 = time.perf_counter()
ntok = enc_sel.select(
    F.sum(F.when(F.col("doc_tokens").isNull(), 0).otherwise(F.size("doc_tokens")))
).collect()[0][0]
mark("encode_count_action", t0)
print("  total tokens:", ntok)

t0 = time.perf_counter()
packed = pack_sequences(enc_sel, Q._CAPSTONE_SEQ)
npacks = packed.count()
mark("pack_count_action", t0)
print("  packs:", npacks)

t0 = time.perf_counter()
packed2 = pack_sequences(
    encode_corpus_with_bundle(docs, loaded, emit_ids=True).select(
        "source", "doc_id", "doc_tokens"
    ),
    Q._CAPSTONE_SEQ,
)
sh = tempfile.mkdtemp(prefix="prof_shards_")
write_packed_shards(packed2, sh, packs_per_shard=8, mode="overwrite")
mark("write_shards_pps8", t0)
nfiles = sum(len(files) for _, _, files in os.walk(sh))
print("  files in tree:", nfiles)

t0 = time.perf_counter()
back = read_packed_shards(spark, sh, verify="content")
mark("read_verify_content", t0)

t0 = time.perf_counter()
out = (
    back.select(
        "source",
        "pack_id",
        F.md5(
            F.concat_ws(
                " ", F.transform("tokens", lambda x: x.cast("string"))
            ).cast("binary")
        ).alias("pack_md5"),
        "n_tokens",
    )
    .orderBy("source", "pack_id")
    .localCheckpoint(eager=True)
)
mark("final_checkpoint", t0)
shutil.rmtree(sh, ignore_errors=True)

print("TOTAL:", round(sum(t.values()), 3))
spark.stop()
