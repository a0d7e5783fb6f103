"""Corpus segmentation operators: stride chunking and C4-style
segment-level exact dedup.

Both are pure DataFrame transforms over a tokens array column, shared
by the registry queries (q106/q107) and any pipeline that needs the
operator directly. Reference anchor: the reference engine has no
corpus operators — these generalize its split/explode text handling
(train_gbt.py:59-62) to the training-data-pipeline surface.

Scale design (see SCALING.md):
- ``stride_chunks`` is explode+project — zero exchanges, fuses into
  the scan.
- ``segment_dedup`` elects first occurrences with a digest-only
  ``groupBy(md5).min(struct)`` aggregate (map-side combined); segment
  bodies shuffle exactly once, in the per-doc reassembly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def chunk_expr(tokens: Column, chunk_idx: Column, window: int, stride: int) -> Column:
    """The tokens of chunk ``chunk_idx``: a ``window``-token slice
    starting at ``chunk_idx * stride`` (0-based), clamped at the end
    of the document."""
    return F.slice(tokens, (chunk_idx * stride + 1).cast("int"), window)


def n_chunks_expr(tokens: Column, window: int, stride: int) -> Column:
    """Number of stride chunks: 1 for short docs, else enough for the
    last chunk to start within ``window`` of the end — every token is
    covered and no chunk starts past the end."""
    sz = F.size(tokens)
    return F.when(sz <= window, F.lit(1)).otherwise(
        F.ceil((sz - window) / F.lit(float(stride))).cast("int") + 1
    )


def stride_chunks(
    docs: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "t",
    window: int = 30,
    stride: int = 20,
) -> DataFrame:
    """Sliding-window chunking: (id, chunk_idx, chunk<array<string>>)
    with ``window - stride`` tokens of overlap between neighbors and a
    possibly-short final chunk. Map-only (plan-asserted in
    tests/test_plans.py via q107)."""
    t = F.col(tokens_col)
    # guard: F.sequence(0, -1) yields a DESCENDING [0, -1] — an empty
    # or NULL tokens array (size(NULL) is -1 with ANSI off) must
    # produce zero chunks, not bogus ones
    idx_seq = F.when(F.size(t) <= 0, F.array().cast("array<int>")).otherwise(
        F.sequence(F.lit(0), n_chunks_expr(t, window, stride) - 1)
    )
    exploded = docs.select(
        id_col,
        tokens_col,
        F.explode(idx_seq).alias("chunk_idx"),
    )
    return exploded.select(
        id_col,
        "chunk_idx",
        chunk_expr(F.col(tokens_col), F.col("chunk_idx"), window, stride).alias(
            "chunk"
        ),
    )


def segment_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "t",
    seg_len: int = 10,
) -> DataFrame:
    """C4-style segment-level exact dedup: cut docs into fixed
    ``seg_len``-token segments, keep each distinct segment text only
    at its first corpus occurrence (min (id, seg_idx)), reassemble
    docs from surviving segments. Docs whose every segment lost the
    election are dropped (C4 drops emptied docs).

    Returns (id, n_segs_kept, clean_text) — see q106 for the
    oracle-checked form and SCALING.md for the 100-TB argument
    (digest-only winner shuffle, bodies move once)."""
    t = F.col(tokens_col)
    nseg = F.ceil(F.size(t) / F.lit(float(seg_len))).cast("int")
    # guard: sequence(0, -1) is DESCENDING — empty or NULL docs
    # (size(NULL) is -1 with ANSI off) get no segments
    seg_arr = F.when(
        F.size(t) <= 0, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), nseg - 1),
            lambda i: F.concat_ws(
                " ", F.slice(t, (i * seg_len + 1).cast("int"), seg_len)
            ),
        )
    )
    segs = docs.select(
        id_col,
        F.posexplode(seg_arr).alias("seg_idx", "seg"),
    )
    winners = (
        segs.select(F.md5("seg").alias("h"), id_col, "seg_idx")
        .groupBy("h")
        .agg(F.min(F.struct(id_col, "seg_idx")).alias("w"))
        .select(
            F.col(f"w.{id_col}").alias(id_col),
            F.col("w.seg_idx").alias("seg_idx"),
        )
    )
    kept = segs.join(winners, [id_col, "seg_idx"], "left_semi")
    return kept.groupBy(id_col).agg(
        F.count("*").alias("n_segs_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg_idx", "seg"))),
                lambda x: x["seg"],
            ),
        ).alias("clean_text"),
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    tokens_col: str = "doc_tokens",
    out_col: str = "tokens",
    doc_separator: str | int | None = None,
    pad_token: str | int | None = None,
    with_doc_ids: bool = False,
) -> DataFrame:
    """MATERIALIZE packed training sequences — the GPT-style
    concat-and-chunk batch artifact itself, not just the pack
    assignment (q84/q197 compute pack ids and offsets; a training
    pipeline ultimately writes the packed token arrays). Documents are
    concatenated per source in ``id_col`` order and cut into
    ``seq_len``-token windows; a document whose tokens straddle a
    boundary is SPLIT across the neighboring packs (standard packing —
    no padding, no discarded tokens). Emits
    ``(source, pack_id, tokens, n_tokens)`` with ``n_tokens ==
    seq_len`` for every pack except each source's ragged tail; the
    caller drops or pads the tail as training policy dictates.

    Scale shape (100 TB): packing is per SOURCE (the q84 argument — a
    single global running sum serializes on one ordered partition;
    per-source runs every stream in parallel and is how real
    pipelines shard the step):

    1. per-doc token-count running sum — a window over the DOC-count
       table (rows = documents, not tokens);
    2. ``posexplode`` the token arrays and key each token by
       ``(cum_before + pos)``: its global position in the source
       stream — map-only, fused after the window;
    3. ONE shuffle keyed by ``(source, global_pos // seq_len)`` with
       order-preserving re-assembly (array_sort over in-pack offsets
       — the q192 collect_list discipline). This token-level exchange
       is the irreducible materialization cost any batch writer pays;
       it is hash-distributed over packs, so it scales with executors
       and no partition sees more than its packs' tokens.

    Determinism: pack contents depend only on (source, doc_id order,
    tokens) — retry/reshuffle stable, engine-replayable (q199's
    oracle replays it in SQL).

    ``doc_separator`` (e.g. ``"<eos>"``) appends one separator token
    after every NON-EMPTY document before packing — the standard
    document-boundary marker training corpora carry so the model can
    learn where contexts end. Empty/NULL docs contribute no separator
    (no content to delimit); separators count toward ``seq_len`` like
    any token and may themselves land as a pack's first slot.

    ``pad_token`` (e.g. ``"<pad>"``) right-pads each source's ragged
    tail pack to exactly ``seq_len`` — the other standard tail policy
    (dropping the tail is the caller filtering ``n_tokens < seq_len``
    BEFORE padding semantics apply, which is why ``n_tokens`` always
    reports the REAL token count, never the padded length: it is the
    loss-mask denominator). Full packs are untouched; the pad is a
    map-only concat on the pack rows, after the shuffle.

    ``with_doc_ids=True`` adds a ``doc_ids`` array position-aligned
    with ``tokens``: each slot's originating document id — what a
    trainer needs to build the block-diagonal attention mask that
    stops contexts attending across packed document boundaries
    (separator tokens carry their document's id). Same plan (the ids
    ride the one collect_list struct); ``doc_ids`` covers the REAL
    tokens only — padding has no source document, so under
    ``pad_token`` its length stays ``n_tokens``.

    The operator is TOKEN-TYPE agnostic: ``tokens_col`` may be
    ``array<string>`` pieces or ``array<int>`` token ids (the
    ``encode_corpus(emit_ids=True)`` output — the training-ready
    form); ``doc_separator``/``pad_token`` then take the separator /
    pad TOKEN ID instead of the string."""
    w = (
        Window.partitionBy(source_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    toks_in = F.col(tokens_col)
    if doc_separator is not None:
        toks_in = F.when(
            toks_in.isNull() | (F.size(toks_in) <= 0), toks_in
        ).otherwise(F.concat(toks_in, F.array(F.lit(doc_separator))))
    # size(NULL) is -1 with ANSI off (the module's standing footgun —
    # see test_empty_token_arrays_produce_nothing): a NULL token array
    # must count 0 toward the running offsets, not walk them backward.
    n_toks = (
        F.when(toks_in.isNull(), F.lit(0))
        .otherwise(F.size(toks_in))
        .cast("long")
    )
    with_cum = docs.select(
        source_col,
        id_col,
        toks_in.alias("_toks"),
        F.coalesce(F.sum(n_toks).over(w), F.lit(0)).alias("_cum_before"),
    )
    # The doc id rides the token-grain rows ONLY under with_doc_ids
    # (ADVICE r11): this shuffle is the operator's dominant cost, and
    # the default policy has no use for ~8 extra bytes per token.
    id_cols = [F.col(id_col).alias("_id")] if with_doc_ids else []
    toks = (
        with_cum.select(
            source_col,
            "_cum_before",
            F.posexplode("_toks").alias("_pos", "_tok"),
            *id_cols,
        )
        .select(
            source_col,
            F.floor((F.col("_cum_before") + F.col("_pos")) / seq_len).alias(
                "pack_id"
            ),
            ((F.col("_cum_before") + F.col("_pos")) % seq_len).alias("_off"),
            "_tok",
            *(["_id"] if with_doc_ids else []),
        )
    )
    # The explicit repartition is the whole point (plan-asserted):
    # without it Catalyst ELIDES the pack-level exchange, because the
    # window's hash(source) partitioning already clusters the grouping
    # keys' subset — and then every pack of a source re-assembles in
    # ONE task, capping token-grain parallelism at #sources. At 100 TB
    # that single elided exchange is the difference between
    # #sources-way and #packs-way parallelism; at small SF it costs
    # one extra exchange the groupBy below then reuses.
    slot_fields = [
        F.col("_off").alias("_o"),
        F.col("_tok").alias("_t"),
    ]
    if with_doc_ids:
        slot_fields.append(F.col("_id").alias("_d"))
    sorted_slots = F.array_sort(F.collect_list(F.struct(*slot_fields)))
    aggs = [F.transform(sorted_slots, lambda s: s["_t"]).alias(out_col)]
    if with_doc_ids:
        aggs.append(
            F.transform(sorted_slots, lambda s: s["_d"]).alias("doc_ids")
        )
    packed = (
        toks.repartition(F.col(source_col), F.col("pack_id"))
        .groupBy(source_col, "pack_id")
        .agg(*aggs)
        .withColumn("n_tokens", F.size(out_col).cast("long"))
    )
    if pad_token is not None:
        packed = packed.withColumn(
            out_col,
            F.when(F.col("n_tokens") >= seq_len, F.col(out_col)).otherwise(
                F.concat(
                    F.col(out_col),
                    F.array_repeat(
                        F.lit(pad_token), (seq_len - F.col("n_tokens")).cast("int")
                    ),
                )
            ),
        )
    return packed


def epoch_shuffle(
    packed: DataFrame,
    seed: int,
    n_buckets: int = 1024,
    source_col: str = "source",
    pack_col: str = "pack_id",
) -> DataFrame:
    """Deterministic EPOCH-LEVEL shuffle order for packed training
    batches — the last thing a data loader needs from the engine: a
    reproducible, seed-keyed global permutation of packs that does
    not sort the corpus on one machine.

    Map-only (zero exchanges, plan-assertable): each pack gets
    ``epoch_key`` = md5 over (seed, source, pack_id) and
    ``epoch_bucket`` = first 28 bits of the tail of that digest mod
    ``n_buckets``. The epoch's global order IS lexicographic
    ``(epoch_bucket, epoch_key, source, pack_id)`` — at scale the
    trainer consumes buckets in index order and sorts WITHIN a bucket
    (corpus/n_buckets packs — small), which is exactly the
    hierarchical shuffle real loaders implement; a global ORDER BY
    of the full corpus on one task is never required. Different
    seeds give statistically independent permutations; the same seed
    replays the same epoch byte-for-byte on any partitioning
    (md5 of values — no engine hash, no partition ids)."""
    if n_buckets < 1:
        raise ValueError("epoch_shuffle needs n_buckets >= 1")
    key = F.md5(
        F.concat_ws(
            ":",
            F.lit(f"epoch{seed}"),
            F.col(source_col).cast("string"),
            F.col(pack_col).cast("string"),
        )
    )
    return packed.withColumn("epoch_key", key).withColumn(
        "epoch_bucket",
        (F.conv(F.substring("epoch_key", 26, 7), 16, 10).cast("long")
         % n_buckets).cast("int"),
    )


PACKED_SHARDS_FORMAT = "packed_shards_v1"
_PACKED_MANIFEST = "manifest.json"
_PACKED_SHARD_COL = "shard"


def write_packed_shards(
    packed: DataFrame,
    path: str,
    source_col: str = "source",
    pack_col: str = "pack_id",
    packs_per_shard: int = 4096,
    mode: str = "error",
) -> dict:
    """Persist ``pack_sequences`` output as IMMUTABLE training shards
    plus a manifest — the artifact a trainer's data loader actually
    reads (VERDICT r11 order #1: the pipeline previously ended at a
    DataFrame; nothing wrote the "immutable packed shards" the
    snapshot story names).

    Layout (deterministic — retry/replay produces the same tree):
    ``path/shards/<source_col>=S/shard=K/`` holds ONE parquet file
    with packs ``[K*packs_per_shard, (K+1)*packs_per_shard)`` of
    source S, rows sorted by ``pack_col``. The explicit
    ``repartition(source, shard)`` puts each shard group in exactly
    one task, so each directory gets exactly one file and file
    contents are a pure function of the input (pack_sequences is
    itself deterministic). ``packs_per_shard`` sizes files: at
    seq_len=2048 ids (int32), 4096 packs/shard is ~32 MB/file —
    tune toward 128-512 MB for HDFS/S3 at 100 TB.

    The manifest (``manifest.json``, tmp + atomic replace — the
    index family's discipline) is computed by READING BACK the
    written files, so writing it also VALIDATES the write: per
    source it records pack/token counts, the pack-id range
    (validated contiguous from 0 — a gap means the input was not a
    pack_sequences output), and an order-independent content
    fingerprint (bit_xor of xxhash64 over whole rows) that
    ``read_packed_shards(verify='content')`` can re-check years
    later. The full DataFrame schema rides in the manifest so reads
    restore exact types (incl. the hive partition columns, immune to
    directory-name type inference).

    Scale shape: one (source, shard) hash shuffle — coarser than the
    (source, pack_id) exchange pack_sequences already paid, and the
    writer's irreducible cost — then one metadata-only read-back
    aggregation. Returns the manifest dict."""
    import json
    import os

    if mode not in ("error", "overwrite"):
        raise ValueError(f"unknown write_packed_shards mode: {mode!r}")
    if packs_per_shard < 1:
        raise ValueError("packs_per_shard must be >= 1")
    if _PACKED_SHARD_COL in packed.columns:
        raise ValueError(
            f"packed frame already has a {_PACKED_SHARD_COL!r} column — "
            "rename it; write_packed_shards derives shard ids itself"
        )
    shards_dir = os.path.join(path, "shards")
    if mode == "error" and os.path.exists(shards_dir):
        raise ValueError(
            f"packed shards already exist at {shards_dir} "
            "(pass mode='overwrite' to replace them)"
        )
    shard = F.floor(F.col(pack_col) / packs_per_shard).cast("long")
    (
        packed.withColumn(_PACKED_SHARD_COL, shard)
        .repartition(F.col(source_col), F.col(_PACKED_SHARD_COL))
        .sortWithinPartitions(source_col, pack_col)
        .write.mode("overwrite" if mode == "overwrite" else "error")
        .partitionBy(source_col, _PACKED_SHARD_COL)
        .parquet(shards_dir)
    )
    # manifest from the FILES, not the input plan: what got persisted
    # is what gets fingerprinted
    spark = packed.sparkSession
    back = spark.read.schema(_shard_read_schema(packed.schema)).parquet(
        shards_dir
    )
    data_cols = [c for c in back.columns if c != _PACKED_SHARD_COL]
    stats = (
        back.groupBy(source_col)
        .agg(
            F.count("*").alias("n_packs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.min(pack_col).alias("min_pack_id"),
            F.max(pack_col).alias("max_pack_id"),
            F.bit_xor(F.xxhash64(*data_cols)).alias("fingerprint"),
        )
        .collect()
    )
    sources = {}
    for r in sorted(stats, key=lambda r: str(r[source_col])):
        if r["min_pack_id"] != 0 or r["max_pack_id"] != r["n_packs"] - 1:
            raise ValueError(
                f"source {r[source_col]!r} pack ids are not contiguous "
                f"from 0 (min={r['min_pack_id']}, max={r['max_pack_id']}, "
                f"n={r['n_packs']}) — not a pack_sequences output"
            )
        sources[str(r[source_col])] = {
            "n_packs": r["n_packs"],
            "n_tokens": r["n_tokens"],
            "fingerprint": r["fingerprint"],
        }
    manifest = {
        "format": PACKED_SHARDS_FORMAT,
        "source_col": source_col,
        "pack_col": pack_col,
        "packs_per_shard": packs_per_shard,
        "columns": data_cols,
        "schema": json.loads(packed.schema.json()),
        "n_packs_total": sum(s["n_packs"] for s in sources.values()),
        "n_tokens_total": sum(s["n_tokens"] for s in sources.values()),
        "sources": sources,
    }
    tmp = os.path.join(path, _PACKED_MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(path, _PACKED_MANIFEST))
    return manifest


def _shard_read_schema(data_schema):
    """The read schema for a shard tree: the data schema plus the
    ``shard`` hive column, with partition-column types PINNED (a
    user-supplied schema overrides directory-name type inference —
    a source named '007' must come back as the string it went in
    as)."""
    from pyspark.sql.types import LongType, StructField, StructType

    return StructType(
        list(data_schema.fields)
        + [StructField(_PACKED_SHARD_COL, LongType())]
    )


def diff_packed_snapshots(path_a: str, path_b: str) -> dict:
    """Compare two packed-shard SNAPSHOTS by manifest alone — the
    zero-scan answer to "what changed between corpus versions?" that
    the immutable-snapshot discipline exists to make cheap. Returns
    per-source verdicts keyed on the manifests' content fingerprints
    (write_packed_shards computes them from the persisted files, so
    equal fingerprints mean bit-identical pack contents):

    ``{"added": [...], "removed": [...], "changed": [...],
       "unchanged": [...], "delta_packs": int, "delta_tokens": int}``

    Both manifests are validated with the loader's own discipline
    (format drift / missing keys raise, never mis-compare). No Spark
    session, no file scans — two KB-sized JSON reads, usable from an
    orchestrator or a CI gate (e.g. "fail the pipeline if a source
    changed without its version bumping")."""
    import json
    import os

    def load(path: str) -> dict:
        mpath = os.path.join(path, _PACKED_MANIFEST)
        if not os.path.exists(mpath):
            raise ValueError(f"no packed-shard manifest at {mpath}")
        with open(mpath) as f:
            m = json.load(f)
        if m.get("format") != PACKED_SHARDS_FORMAT:
            raise ValueError(
                f"unrecognized packed-shard format at {path}: "
                f"{m.get('format')}"
            )
        if "sources" not in m:
            raise ValueError(
                f"packed-shard manifest at {path} is missing required "
                "keys: ['sources']"
            )
        return m

    a, b = load(path_a), load(path_b)
    sa, sb = a["sources"], b["sources"]
    added = sorted(set(sb) - set(sa))
    removed = sorted(set(sa) - set(sb))
    common = set(sa) & set(sb)
    changed = sorted(
        s for s in common if sa[s]["fingerprint"] != sb[s]["fingerprint"]
    )
    unchanged = sorted(common - set(changed))
    return {
        "added": added,
        "removed": removed,
        "changed": changed,
        "unchanged": unchanged,
        "delta_packs": sum(sb[s]["n_packs"] for s in sb)
        - sum(sa[s]["n_packs"] for s in sa),
        "delta_tokens": sum(sb[s]["n_tokens"] for s in sb)
        - sum(sa[s]["n_tokens"] for s in sa),
    }


def read_packed_shards(
    spark, path: str, verify: str | None = "counts"
) -> DataFrame:
    """Open a ``write_packed_shards`` tree: load + validate the
    manifest (loud ValueError on absence, format drift, or missing
    keys — the bundle-loader discipline), read the parquet shards
    under the manifest's pinned schema, and optionally cross-check
    the files against the manifest:

    - ``verify=None``: trust the manifest (the 100-TB default — a
      trainer opening the same snapshot thousands of times should
      not re-scan it).
    - ``verify='counts'`` (default): per-source pack counts vs the
      manifest — one metadata-only pass (parquet footers).
    - ``verify='content'``: recompute the per-source fingerprint —
      one full scan; what an auditor runs once per snapshot.

    Returns the packed DataFrame (data columns only — the ``shard``
    layout column is dropped; it is derivable as
    ``pack_id // packs_per_shard``)."""
    import json
    import os

    from pyspark.sql.types import StructType

    mpath = os.path.join(path, _PACKED_MANIFEST)
    if not os.path.exists(mpath):
        raise ValueError(f"no packed-shard manifest at {mpath}")
    with open(mpath) as f:
        manifest = json.load(f)
    if manifest.get("format") != PACKED_SHARDS_FORMAT:
        raise ValueError(
            f"unrecognized packed-shard format at {path}: "
            f"{manifest.get('format')}"
        )
    missing = [
        k
        for k in ("source_col", "pack_col", "columns", "schema", "sources")
        if k not in manifest
    ]
    if missing:
        raise ValueError(
            f"packed-shard manifest at {path} is missing required keys: "
            f"{missing}"
        )
    if verify not in (None, "counts", "content"):
        raise ValueError(f"unknown read_packed_shards verify: {verify!r}")
    schema = StructType.fromJson(manifest["schema"])
    back = spark.read.schema(_shard_read_schema(schema)).parquet(
        os.path.join(path, "shards")
    )
    df = back.select(*manifest["columns"])
    if verify is not None:
        src = manifest["source_col"]
        aggs = [F.count("*").alias("n_packs")]
        if verify == "content":
            aggs.append(
                F.bit_xor(F.xxhash64(*manifest["columns"])).alias("fp")
            )
        got = {
            str(r[src]): r
            for r in df.groupBy(src).agg(*aggs).collect()
        }
        want = manifest["sources"]
        if set(got) != set(want):
            raise ValueError(
                f"packed shards at {path} diverge from manifest: sources "
                f"on disk {sorted(got)} != manifest {sorted(want)}"
            )
        for s, row in got.items():
            if row["n_packs"] != want[s]["n_packs"]:
                raise ValueError(
                    f"packed shards at {path}: source {s!r} has "
                    f"{row['n_packs']} packs on disk, manifest says "
                    f"{want[s]['n_packs']}"
                )
            if verify == "content" and row["fp"] != want[s]["fingerprint"]:
                raise ValueError(
                    f"packed shards at {path}: source {s!r} content "
                    "fingerprint mismatch (files modified since write)"
                )
    return df
