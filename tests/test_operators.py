"""Unit tests for operator-library functions that aren't (fully)
covered by the registry's oracle gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sql_data_warehouse_spark.operators import multimodal
from sql_data_warehouse_spark.operators.asof import asof_join_backward
from sql_data_warehouse_spark.operators.skew import salted_join
from sql_data_warehouse_spark.sources import load_table

from .conftest import SF_SMOKE


def test_salted_join_matches_plain_join(spark):
    o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, SF_SMOKE, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    plain = o.join(c, "o_custkey")
    salted = salted_join(o, c, "o_custkey", salt_from="o_orderkey", n_salts=4)
    assert salted.count() == plain.count()
    assert salted.select(F.sum("o_orderkey")).collect() == plain.select(
        F.sum("o_orderkey")
    ).collect()


def test_asof_join_edges(spark):
    left = spark.createDataFrame(
        [(1, 10, "l1"), (1, 20, "l2"), (2, 5, "l3")],
        "k long, t long, lv string",
    ).select("k", F.timestamp_seconds("t").alias("ts"), "lv")
    right = spark.createDataFrame(
        [(1, 10, "r_eq"), (1, 15, "r_mid"), (3, 1, "r_other")],
        "k long, t long, rv string",
    ).select("k", F.timestamp_seconds("t").alias("ts"), "rv")
    out = {
        r["lv"]: r["matched_rv"]
        for r in asof_join_backward(left, right, key="k").collect()
    }
    # Equal timestamps match (inclusive); later right rows win;
    # keys with no prior right row get NULL.
    assert out == {"l1": "r_eq", "l2": "r_mid", "l3": None}


def test_multimodal_resize_and_real_decode(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(30)
    media = multimodal.attach_fake_media(docs)
    resized = multimodal.resize_images(media, max_side=128)
    rows = resized.collect()
    assert rows and all(r["resized_to"] == 128 for r in rows)
    n_images = media.filter(F.col("media_type") == "image").count()
    assert len(rows) == n_images
    # decode_real is a REAL stdlib decoder since r3: garbage must be
    # rejected loudly, not silently faked.
    with pytest.raises(ValueError):
        multimodal.decode_real(b"x", "image")


def test_png_codec_roundtrip_and_filters():
    """PNG decode correctness beyond what the encoder emits: the
    encoder writes filter type 0 only, so Sub/Up/Average/Paeth
    unfiltering is exercised by hand-built filtered scanlines."""
    import struct
    import zlib

    # Encoder→decoder roundtrip preserves every pixel.
    w, h = 7, 5
    pix = lambda x, y: (13 * x + 41 * y + 5) % 256  # noqa: E731
    got_w, got_h, got = multimodal.decode_png(
        multimodal.encode_png(w, h, pix)
    )
    assert (got_w, got_h) == (w, h)
    assert list(got) == [pix(x, y) for y in range(h) for x in range(w)]

    # Hand-filter the same image with each filter type per row
    # (cycling 1,2,3,4) and require identical recovered pixels.
    rows = [[pix(x, y) for x in range(w)] for y in range(h)]
    raw = bytearray()
    prev = [0] * w
    for y, line in enumerate(rows):
        ftype = (y % 4) + 1
        raw.append(ftype)
        for x in range(w):
            a = line[x - 1] if x else 0
            b = prev[x]
            c = prev[x - 1] if x else 0
            if ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            raw.append((line[x] - pred) & 0xFF)
        prev = line

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(bytes(raw)))
           + chunk(b"IEND", b""))
    fw, fh, fpix = multimodal.decode_png(png)
    assert (fw, fh) == (w, h)
    assert list(fpix) == [p for line in rows for p in line]

    # A flipped payload byte must fail the CRC check.
    bad = bytearray(multimodal.encode_png(4, 4, lambda x, y: x * y))
    bad[40] ^= 0xFF
    with pytest.raises(ValueError):
        multimodal.decode_png(bytes(bad))


def test_wav_codec_roundtrip():
    samples = [0, 1, -1, 32767, -32768, 12345, -12345]
    rate, got = multimodal.decode_wav(multimodal.encode_wav(samples, 44100))
    assert rate == 44100
    assert list(got) == samples
    # Odd-length chunk padding: an extra word-aligned chunk before
    # data must be skipped correctly.
    import struct

    extra = b"LIST" + struct.pack("<I", 3) + b"abc\x00"
    wav = bytearray(multimodal.encode_wav(samples))
    wav[12:12] = extra  # splice between RIFF header and fmt chunk
    wav[4:8] = struct.pack("<I", struct.unpack("<I", bytes(wav[4:8]))[0] + len(extra))
    rate2, got2 = multimodal.decode_wav(bytes(wav))
    assert rate2 == 8000 and list(got2) == samples
    with pytest.raises(ValueError):
        multimodal.decode_wav(b"RIFFxxxxNOPE")


def test_avi_codec_roundtrip_and_verification():
    """AVI container correctness: stride padding (w=9 → stride 12),
    bottom-up row re-flip, header agreement, and idx1 replay — a
    corrupted index offset, a truncated payload, and an unsupported
    bit depth must all be rejected loudly."""
    import struct

    enc = multimodal._CODEC_NS["encode_avi"]
    dec = multimodal._CODEC_NS["decode_avi"]

    w, h, n = 9, 5, 3
    frames = [
        bytes(((7 * f + 3 * x + 11 * y) % 256)
              for y in range(h) for x in range(w))
        for f in range(n)
    ]
    payload = enc(w, h, frames, rate=10, scale=1)
    gw, gh, rate, scale, got = dec(payload)
    assert (gw, gh, rate, scale) == (w, h, 10, 1)
    assert got == tuple(frames)

    # unified decode path: per-clip stats
    stats = multimodal.decode_real(payload, "video")
    assert stats == {
        "width": w, "height": h, "sample_rate": 0, "n_samples": n,
        "duration_ms": n * 100,
        "content_sum": sum(sum(f) for f in frames),
    }

    # corrupt an idx1 offset -> index replay fails
    bad = bytearray(payload)
    i = payload.rindex(b"idx1")
    bad[i + 8 + 16 + 8] ^= 1
    with pytest.raises(ValueError, match="idx1"):
        dec(bytes(bad))

    # truncation at several depths -> loud ValueError, never struct
    for cut in (13, 40, 100, len(payload) - 4):
        with pytest.raises(ValueError):
            dec(payload[:cut])

    # 24-bit frames are outside the supported subset: patch
    # biBitCount in strf and expect refusal
    bits = bytearray(payload)
    j = payload.index(b"strf") + 8  # BITMAPINFOHEADER start
    bits[j + 14:j + 16] = struct.pack("<H", 24)
    with pytest.raises(ValueError, match="8-bit"):
        dec(bytes(bits))

    with pytest.raises(ValueError):
        dec(b"RIFFxxxxNOPE")


def test_avi_short_header_chunks_raise_valueerror():
    """ADVICE r8 #4: an avih/strh/strf chunk whose DECLARED length is
    shorter than its fixed struct (but still inside the payload) must
    raise the promised ValueError, not struct.error from a short
    slice."""
    import struct

    enc = multimodal._CODEC_NS["encode_avi"]
    dec = multimodal._CODEC_NS["decode_avi"]
    payload = enc(4, 2, [bytes(8), bytes(8)], rate=10, scale=1)
    for tag, short in ((b"avih", 8), (b"strh", 12), (b"strf", 16)):
        bad = bytearray(payload)
        at = payload.index(tag)
        bad[at + 4:at + 8] = struct.pack("<I", short)
        with pytest.raises(ValueError, match=f"short {tag.decode()}"):
            dec(bytes(bad))


def test_gif_codec_roundtrip_and_verification():
    """GIF89a with REAL variable-width LZW: encode∘decode identity on
    multi-frame grayscale animations (including a frame long enough
    to grow the code width several times), plus loud rejection of
    structural corruption."""
    import struct

    enc = multimodal.encode_gif
    dec = multimodal.decode_gif

    w, h, n = 13, 7, 3   # odd width exercises non-aligned packing
    frames = [
        bytes(((5 * f + 7 * x + 13 * y) % 256)
              for y in range(h) for x in range(w))
        for f in range(n)
    ]
    payload = enc(w, h, frames, delay_cs=4)
    gw, gh, delay, got = dec(payload)
    assert (gw, gh, delay) == (w, h, 4)
    assert got == tuple(frames)

    # a big high-entropy frame: the LZW table passes every width
    # growth step; identity must still hold bit-for-bit
    big = bytes((i * 131 + (i >> 7) * 17) % 256 for i in range(200 * 100))
    _, _, _, got2 = dec(enc(200, 100, [big]))
    assert got2 == (big,)

    # constant frame: maximal LZW compression path (KwKwK chains)
    flat = bytes(128 for _ in range(64 * 64))
    assert dec(enc(64, 64, [flat]))[3] == (flat,)

    with pytest.raises(ValueError, match="signature"):
        dec(b"NOTAGIF" + payload)
    with pytest.raises(ValueError, match="trailer"):
        dec(payload[:-1])
    # truncation inside the LZW sub-blocks
    with pytest.raises(ValueError):
        dec(payload[:len(payload) // 2])
    # corrupt an LZW byte deep in frame data -> decoder must catch it
    # (code beyond table / length mismatch), never return silently
    bad = bytearray(payload)
    # first 0x2C AFTER the 768-byte palette (the palette itself
    # contains gray 0x2C) — that's the image descriptor
    img_at = payload.index(b"\x2C", 13 + 768)
    bad[img_at + 15] ^= 0xFF
    with pytest.raises(ValueError):
        dec(bytes(bad))


def test_gif_decode_canonical_hand_vector():
    """Decode the canonical hand-assembled 1×1 GIF89a (the well-known
    43-byte minimal GIF): validates the decoder against a byte string
    NOT produced by our encoder — signature walk, GCE parse, and the
    3-code LZW stream (clear, literal 0, EOI) at width 3."""
    vec = (
        b"GIF89a"
        + b"\x01\x00\x01\x00"      # 1x1 logical screen
        + b"\x80\x00\x00"          # global table, 2 entries
        + b"\x00\x00\x00\xff\xff\xff"  # black, white (both grayscale)
        + b"\x21\xf9\x04\x01\x00\x00\x00\x00"  # GCE, delay 0
        + b"\x2c\x00\x00\x00\x00\x01\x00\x01\x00\x00"  # descriptor
        + b"\x02\x02\x44\x01\x00"  # min code 2; codes: clear, 0, EOI
        + b"\x3b"
    )
    w, h, delay, frames = multimodal.decode_gif(vec)
    assert (w, h, delay) == (1, 1, 0)
    assert frames == (b"\x00",)    # palette entry 0 = black


def test_gif_lzw_eoi_width_at_power_boundaries():
    """Code-review r9 regression: when the decoder's post-final-code
    append lands exactly on a 2^width table boundary it widens before
    reading EOI — the encoder must emit EOI at that widened width.
    Pre-fix, high-entropy frames of length 4192 (seed 1) and 8663
    desynced fatally whenever the stream ended byte-aligned. Sweep
    the lengths around every observed failure point."""
    import random

    rnd = random.Random(1)
    blob = bytes(rnd.randrange(256) for _ in range(8700))
    for n in list(range(4180, 4210)) + list(range(8650, 8680)):
        data = blob[:n]
        _, _, _, got = multimodal.decode_gif(
            multimodal.encode_gif(n, 1, [data]))
        assert got == (data,), f"roundtrip broke at length {n}"


def test_gif_lzw_table_reset_on_long_stream():
    """A frame large and varied enough to fill the 4096-entry LZW
    table forces the encoder's CLEAR-and-reset path; the decoder must
    resynchronize through it."""
    import random

    rnd = random.Random(42)
    data = bytes(rnd.randrange(256) for _ in range(300 * 200))
    _, _, _, got = multimodal.decode_gif(
        multimodal.encode_gif(300, 200, [data]))
    assert got == (data,)


def test_decoders_never_escape_valueerror():
    """Every real decoder promises LOUD ValueError on malformed input
    — fuzz all four with seeded byte mutations, every truncation
    length, and pure-random buffers, and assert no struct.error /
    IndexError / TypeError ever escapes (the generalized ADVICE r8 #4
    guarantee; this fuzz found and fixed short-chunk struct.error
    paths in PNG/WAV and a None-movi TypeError in AVI)."""
    import random

    dec = {
        "png": multimodal.decode_png,
        "wav": multimodal.decode_wav,
        "avi": multimodal._CODEC_NS["decode_avi"],
        "gif": multimodal.decode_gif,
    }
    valid = {
        "png": multimodal.encode_png(9, 5, lambda x, y: (3 * x + 7 * y) % 256),
        "wav": multimodal.encode_wav([0, 100, -100, 32767, -32768], 8000),
        "avi": multimodal._CODEC_NS["encode_avi"](
            9, 5, [bytes(45), bytes(45)]),
        "gif": multimodal.encode_gif(9, 5, [bytes(45), bytes(45)]),
    }
    rnd = random.Random(7)
    for kind, payload in valid.items():
        cases = []
        for _ in range(1500):
            b = bytearray(payload)
            for _ in range(rnd.randrange(1, 4)):
                b[rnd.randrange(len(b))] = rnd.randrange(256)
            cases.append(bytes(b))
        cases += [payload[:cut] for cut in range(len(payload))]
        cases += [
            bytes(rnd.randrange(256) for _ in range(rnd.randrange(300)))
            for _ in range(500)
        ]
        for blob in cases:
            try:
                dec[kind](blob)
            except ValueError:
                pass
            # any other exception type propagates and fails the test


def test_fake_decode_batch_shape():
    import pandas as pd

    pdf = pd.DataFrame(
        {"doc_id": [1, 2], "payload": [b"abc", b"defgh"], "media_type": ["image", "audio"]}
    )
    out = multimodal.fake_decode_batch(pdf)
    assert list(out.columns) == [
        "doc_id", "media_type", "n_bytes", "checksum", "width", "height"
    ]
    assert out["n_bytes"].tolist() == [3, 5]


def test_approx_distinct_error_bound(spark):
    from sql_data_warehouse_spark.analytics.extended import approx_distinct_users

    row = approx_distinct_users(spark, SF_SMOKE).collect()[0]
    assert row["exact_users"] > 0
    # rsd=0.02 → stay well inside 5× the nominal bound.
    assert row["rel_error"] < 0.10


def test_approx_percentiles_track_exact(spark):
    from sql_data_warehouse_spark.analytics.extended import order_value_percentiles
    from sql_data_warehouse_spark.analytics.incremental import (
        approx_order_value_percentiles,
    )

    exact = {r["priority"]: r for r in order_value_percentiles(spark, SF_SMOKE).collect()}
    approx = {
        r["priority"]: r
        for r in approx_order_value_percentiles(spark, SF_SMOKE).collect()
    }
    assert set(exact) == set(approx)
    for prio, e in exact.items():
        a = approx[prio]
        for q in ("p50", "p90", "p99"):
            assert abs(a[q] - e[q]) / e[q] < 0.05, (prio, q, a[q], e[q])


def test_connected_components_deep_chain(spark):
    # A 30-node path (diameter 29) plus a triangle and two isolates:
    # proves the min-label propagation actually iterates to the fixed
    # point (the registry's real-data clusters are shallow) and that
    # isolated nodes keep their own id.
    from sql_data_warehouse_spark.operators.dedup import connected_components

    chain = [(i, i + 1) for i in range(100, 129)]
    tri = [(7, 3), (3, 5), (5, 7)]
    edges = spark.createDataFrame(chain + tri, "src long, dst long")
    nodes = spark.createDataFrame(
        [(i,) for i in range(100, 130)] + [(3,), (5,), (7,), (900,), (901,)],
        "id long",
    )
    out = {
        r["id"]: r["label"]
        for r in connected_components(edges, nodes=nodes).collect()
    }
    assert all(out[i] == 100 for i in range(100, 130))
    assert out[3] == out[5] == out[7] == 3
    assert out[900] == 900 and out[901] == 901


def test_simhash_banding_full_recall(spark):
    # Pigeonhole property: every pair within max_hamming of each other
    # appears in the banded join output — compare against the
    # brute-force all-pairs hamming filter on the same signatures.
    from sql_data_warehouse_spark.operators.dedup import (
        simhash_near_dup_pairs,
        simhash_signatures,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    banded = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_near_dup_pairs(docs, max_hamming=3).collect()
    }
    sigs = simhash_signatures(docs).alias("a")
    brute = (
        sigs.join(
            simhash_signatures(docs).alias("b"),
            F.col("a.doc_id") < F.col("b.doc_id"),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr("bit_count(a.simhash ^ b.simhash)").alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
    )
    expected = {(r["doc_a"], r["doc_b"]) for r in brute.collect()}
    assert banded == expected


def test_banded_fuzzy_equals_naive_blocked(spark):
    """Pass-Join segment blocking must recover every naive
    nation-blocked Levenshtein<=2 pair on the oracle-scale data."""
    from sql_data_warehouse_spark.analytics import all_queries

    reg = all_queries()
    sf = "/root/testdata/sf0.01"
    key = lambda df: sorted(
        map(tuple, df.toPandas().astype(str).values.tolist())
    )
    banded = key(reg["supplier_fuzzy_pairs_banded"].builder(spark, sf))
    naive = key(reg["supplier_fuzzy_pairs"].builder(spark, sf))
    assert banded == naive and len(banded) > 0


def test_minhash_from_sets_identical_to_text_path(spark):
    """The shared-shingle OPH path (minhash_signatures_from_sets,
    used by dedup_pipeline_keep_best) must produce bit-identical
    signatures to the position-explode text path the DuckDB twin
    mirrors — MIN over duplicate shingles == MIN over the distinct
    set."""
    from sql_data_warehouse_spark.operators import dedup

    docs = load_table(spark, SF_SMOKE, "documents").filter(
        F.col("doc_id") < 60
    )
    via_text = {
        r["doc_id"]: tuple(r["signature"])
        for r in dedup.minhash_signatures(docs).collect()
    }
    via_sets = {
        r["doc_id"]: tuple(r["signature"])
        for r in dedup.minhash_signatures_from_sets(
            dedup.shingle_sets(docs)
        ).collect()
    }
    assert via_sets == via_text and len(via_sets) > 0


def test_chain_keep_best_agrees_with_exact(spark):
    """Quality gate for the linear-volume dedup path: on the smoke
    corpus, the chain/sketch pipeline must agree with the exact-verify
    pipeline on (a) >=90% of keep/drop decisions and (b) >=90% of
    same-cluster co-membership over the exact form's duplicate pairs —
    the chain spans buckets and the bottom-k estimate only blurs
    borderline pairs, so wholesale divergence means a broken stage,
    not estimator noise."""
    from sql_data_warehouse_spark.analytics.llmops import (
        dedup_keep_best_chain, dedup_pipeline_keep_best,
    )

    exact = {
        r["doc_id"]: (r["cluster_id"], r["is_kept"])
        for r in dedup_pipeline_keep_best(spark, SF_SMOKE).collect()
    }
    chain = {
        r["doc_id"]: (r["cluster_id"], r["is_kept"])
        for r in dedup_keep_best_chain(spark, SF_SMOKE).collect()
    }
    assert set(exact) == set(chain), "both forms cover every doc"
    keep_agree = sum(
        exact[d][1] == chain[d][1] for d in exact) / len(exact)
    assert keep_agree >= 0.9, keep_agree
    # co-membership recall over the exact form's non-singleton pairs
    from collections import defaultdict

    exact_clusters = defaultdict(list)
    for d, (c, _) in exact.items():
        exact_clusters[c].append(d)
    pairs = [
        (a, b)
        for mem in exact_clusters.values() if len(mem) > 1
        for i, a in enumerate(mem) for b in mem[i + 1:]
    ]
    assert pairs, "smoke corpus must contain duplicate clusters"
    same = sum(chain[a][0] == chain[b][0] for a, b in pairs) / len(pairs)
    assert same >= 0.9, same


def test_bottomk_estimator_exact_when_union_fits(spark):
    """J^ = |B_k(A∪B) ∩ A_k ∩ B_k| / |B_k(A∪B)| is EXACT whenever
    |A ∪ B| <= k — check against hand-computed Jaccard on tiny sets,
    plus a truncation case (k smaller than the union) staying within
    the ±1/sqrt(k)-ish band."""
    from pyspark.sql import Row

    from sql_data_warehouse_spark.operators.dedup import (
        jaccard_bottomk_verify, shingle_sets,
    )

    docs = spark.createDataFrame([
        Row(doc_id=1, text="abcdefghij"),        # shingles of len 8: 3
        Row(doc_id=2, text="abcdefghijk"),       # superset: 4
        Row(doc_id=3, text="zzzzzzzzzzzz"),      # disjoint content
    ])
    sets = shingle_sets(docs)
    from sql_data_warehouse_spark.operators.dedup import bottomk_sketches

    sk = bottomk_sketches(sets, k=64)
    pairs = spark.createDataFrame(
        [Row(doc_a=1, doc_b=2), Row(doc_a=1, doc_b=3)])
    est = {
        (r["doc_a"], r["doc_b"]): r["jaccard_est"]
        for r in jaccard_bottomk_verify(pairs, sk, k=64).collect()
    }
    assert est[(1, 2)] == 3 / 4          # exact: unions fit in k
    assert est[(1, 3)] == 0.0


def test_bpe_distributed_matches_driver_loop(spark):
    """The all-distributed BPE loop (HOF pair counts + fold merge,
    one TakeOrdered row per iteration) and the bounded driver-loop
    form (the registered query) are two independent implementations
    of the same greedy algorithm — their merge SEQUENCES must agree
    exactly, counts included."""
    from sql_data_warehouse_spark.operators.bpe import (
        bpe_train, bpe_train_capped,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    dist = [tuple(r) for r in bpe_train(docs, n_merges=6).collect()]
    drv = [tuple(r) for r in bpe_train_capped(docs, n_merges=6).collect()]
    assert dist == drv and len(drv) == 6, (dist, drv)


def test_bpe_merge_application_greedy(spark):
    """Fold-based merge application must be greedy leftmost
    non-overlapping: merging ('a','a') over 'aaa a' gives ['aa','a',
    '</w>', ...] — a fused symbol never re-merges within the pass."""
    from pyspark.sql import Row

    from sql_data_warehouse_spark.operators.bpe import (
        _apply_merge, _init_syms,
    )

    df = spark.createDataFrame([Row(w="aaa")]).select(
        _apply_merge(_init_syms(F.col("w")), "a", "a").alias("syms")
    )
    assert df.collect()[0]["syms"] == ["aa", "a", "</w>"]


def test_bpe_encode_matches_train_identity(spark):
    """Exact identity between the two independent code paths: encoding
    the training corpus with the learned merges must shed EXACTLY
    Σ pair_count symbols (each counted occurrence fuses one adjacent
    pair; lowest-rank-first apply ≡ sequential apply for a consistent
    merge table — a pair involving a fused symbol always ranks after
    the merge that created it)."""
    from sql_data_warehouse_spark.operators.bpe import (
        bpe_encode_stats, bpe_train_capped, word_freq,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    mt = bpe_train_capped(docs, n_merges=10).collect()
    merges = [(r["left"], r["right"]) for r in mt]
    shed = sum(r["pair_count"] for r in mt)

    init_symbols = (
        word_freq(docs)
        .select((F.length("w") + 1) * F.col("cnt"))
        .groupBy().sum().collect()[0][0]
    )
    enc = bpe_encode_stats(docs, merges).agg(
        F.sum("total_tokens"), F.sum("total_init_symbols")
    ).collect()[0]
    assert enc[1] == init_symbols
    assert enc[0] == init_symbols - shed, (enc[0], init_symbols, shed)


def test_bpe_identity_on_self_overlapping_runs(spark):
    """The identity's hard case (r4 advisor counterexample): runs like
    'aaaa' where the argmax pair OVERLAPS itself — Sennrich-count 3·n
    occurrences of (a,a) but greedy leftmost fuses only 2·n. Both
    trainers must record pair_count = actual fusions so
    ``final tokens == initial symbols − Σ pair_count`` holds, and the
    distributed fold (sum_n deltas) must agree with the driver loop
    exactly on this corpus too."""
    from pyspark.sql import Row

    from sql_data_warehouse_spark.operators.bpe import (
        bpe_encode_stats, bpe_train, bpe_train_capped, word_freq,
    )

    docs = spark.createDataFrame(
        [Row(doc_id=i, lang="xx", text="aaaa aaa aa baa aab")
         for i in range(10)]
    )
    mt = bpe_train_capped(docs, n_merges=4).collect()
    dist = [tuple(r) for r in bpe_train(docs, n_merges=4).collect()]
    assert dist == [tuple(r) for r in mt], (dist, mt)
    # first merge is (a,a): 10 docs × (2+1+1+1+1) greedy fusions —
    # the overlapping Sennrich count would be 10 × (3+2+1+1+1) = 80
    first = mt[0]
    assert (first["left"], first["right"]) == ("a", "a")
    assert first["pair_count"] == 60

    merges = [(r["left"], r["right"]) for r in mt]
    shed = sum(r["pair_count"] for r in mt)
    init_symbols = (
        word_freq(docs)
        .select((F.length("w") + 1) * F.col("cnt"))
        .groupBy().sum().collect()[0][0]
    )
    enc = bpe_encode_stats(docs, merges).agg(
        F.sum("total_tokens"), F.sum("total_init_symbols")
    ).collect()[0]
    assert enc[1] == init_symbols
    assert enc[0] == init_symbols - shed, (enc[0], init_symbols, shed)


def test_bpe_oracle_survives_vocab_exhaustion(spark):
    """ADVICE r6 #1: a corpus whose vocabulary exhausts before
    n_merges (every in-head word fused to one symbol) must give the
    unrolled DuckDB chain the same SHORTER merge table and the real
    final token totals — the sentinel ``top{i}`` keeps later ``v``
    stages alive instead of collapsing them to empty relations, and
    ``WHERE sum{i}.sn > 0`` drops sentinel merges exactly where the
    Spark loop breaks on ``not counts``."""
    import duckdb
    import pandas as pd
    from pyspark.sql import Row

    from sql_data_warehouse_spark.operators.bpe import (
        bpe_encode_stats, bpe_train_capped, bpe_train_capped_sql,
        bpe_encode_stats_sql,
    )

    pdf = pd.DataFrame({
        "doc_id": [1, 2],
        "lang": ["en", "en"],
        "text": ["ab ab a", "ab b"],
    })
    docs = spark.createDataFrame([Row(**r) for r in pdf.to_dict("records")])
    n_merges = 8  # corpus supports only 3 merges

    got = [tuple(r) for r in bpe_train_capped(
        docs, n_merges=n_merges).collect()]
    con = duckdb.connect()
    con.register("documents", pdf)
    want = sorted(
        tuple(r) for r in con.sql(
            bpe_train_capped_sql(n_merges=n_merges)).fetchall()
    )
    assert got == want and 0 < len(got) < n_merges, (got, want)

    merges = [(left, right) for _, left, right, _, _ in got]
    enc = sorted(
        tuple(r) for r in bpe_encode_stats(docs, merges).collect()
    )
    enc_sql = sorted(
        tuple(r) for r in con.sql(
            bpe_encode_stats_sql(n_merges=n_merges)).fetchall()
    )
    assert enc == enc_sql and enc[0][2] > 0, (enc, enc_sql)


def test_cc_distributed_loop_matches_driver_finish(spark):
    """The hybrid CC's two paths must agree exactly: force the same
    edge set through the distributed pointer-doubling loop and the
    driver union-find (small oracle-gated graphs now take the driver
    path, so the loop needs its own equivalence gate — it remains the
    path for corpus-scale edge sets)."""
    from pyspark.sql import Row

    from sql_data_warehouse_spark.operators.dedup import (
        _cc_driver_finish, _cc_loop,
    )

    # Chain + triangle + singleton-adjacent shapes, ids out of order
    edges = spark.createDataFrame(
        [Row(src=s, dst=d) for s, d in
         [(9, 2), (2, 5), (5, 1), (10, 11), (11, 10), (20, 21)]]
    )
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    loop = {(r["id"], r["label"]) for r in _cc_loop(sym, None, 25).collect()}
    drv = {(r["id"], r["label"])
           for r in _cc_driver_finish(spark, sym, None).collect()}
    assert loop == drv
    assert (1, 1) in loop and (9, 1) in loop and (21, 20) in loop


def test_minhash_inrow_bands_equal_aggregate_form(spark):
    """The stream-safe per-row OPH (array-HOF filters + array_min)
    must reproduce the aggregate form's band relation EXACTLY —
    including densified bins on sparse docs (the short-text rows
    below leave most nibble bins empty)."""
    from pyspark.sql import Row

    from sql_data_warehouse_spark.operators.dedup import (
        minhash_band_hashes, minhash_band_hashes_inrow,
    )

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate([
            "the quick brown fox jumps over the lazy dog",
            "the quick brown fox jumps over the lazy cat",
            "zz",  # sparse: fewer shingles than bins -> densification
            "completely different content here with many more words",
        ])]
    )
    a = minhash_band_hashes(docs).orderBy("doc_id", "band_idx").collect()
    b = minhash_band_hashes_inrow(docs).orderBy("doc_id", "band_idx").collect()
    assert a == b


def test_scalable_row_number_equals_global_window(spark):
    """The two-phase surrogate-key generator (W2 scale hazard
    resolution) must reproduce the global unpartitioned window's keys
    bit-for-bit, regardless of input partitioning — boundary
    placement shifts bucket membership, never global rank."""
    from pyspark.sql import Window as W

    from sql_data_warehouse_spark.operators.skew import (
        scalable_row_number,
    )

    # non-contiguous, shuffled ids across several input partitions
    ids = [i * 7 % 9973 for i in range(2000)]
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in ids], "id long, payload string"
    )
    want = {
        r["id"]: r["sk"]
        for r in base.select(
            "id", F.row_number().over(W.orderBy("id")).cast("long")
            .alias("sk")
        ).collect()
    }
    for n_input in (1, 7):
        got = {
            r["id"]: r["sk"]
            for r in scalable_row_number(
                base.repartition(n_input), "id", n_parts=5
            ).collect()
        }
        assert got == want
