"""Round-9 wave: color baseline JPEG (4:2:0) codec units.

The Spark-side query (`mm_decode_real_jpeg_color`) is gated by the
DuckDB oracle; these tests pin the CODEC itself — encode→decode must
equal an INDEPENDENT reference path that assembles planes straight
from the synthetic coefficients (never touching the entropy coder),
so a Huffman/predictor/upsample bug cannot cancel itself out.
"""

from __future__ import annotations

import numpy as np
import pytest

from pmc_conversion_spark.functions.multimodal import (
    JPEG_AC_BITS_C, JPEG_AC_VALS_C, JPEG_DC_BITS_C, JPEG_DC_VALS_C,
    JPEG_ZIGZAG, _idct_basis, _ycc_to_rgb, decode_jpeg_color,
    encode_jpeg_color, jpeg_qtab_chroma_natural, jpeg_qtab_natural,
    synth_jpeg_color_coeffs)


def test_chroma_huffman_tables_are_well_formed():
    assert sum(JPEG_DC_BITS_C) == len(JPEG_DC_VALS_C) == 12
    assert sum(JPEG_AC_BITS_C) == len(JPEG_AC_VALS_C) == 162
    # canonical construction must not overflow any code length
    from pmc_conversion_spark.functions.multimodal import _canonical_codes
    for bits, vals in ((JPEG_DC_BITS_C, JPEG_DC_VALS_C),
                       (JPEG_AC_BITS_C, JPEG_AC_VALS_C)):
        codes = _canonical_codes(bits, vals)
        assert len(codes) == len(vals)
        for _sym, (code, ln) in codes.items():
            assert 0 <= code < (1 << ln)


def _block_pixels(zz, qt, basis):
    coef = np.zeros(64, dtype=np.int64)
    for z in range(64):
        coef[JPEG_ZIGZAG[z]] = zz[z]
    d = coef.reshape(8, 8) * np.array(qt, dtype=np.int64).reshape(8, 8)
    num = (basis @ d.T @ basis.T).T
    pix = ((num + (1 << 41) + (1 << 56)) >> 42) - (1 << 14) + 128
    return np.clip(pix, 0, 255)


def _reference_rgb(mid):
    basis = np.array(_idct_basis(), dtype=np.int64)
    yb, cbb, crb = synth_jpeg_color_coeffs(mid)
    Y = np.zeros((16, 32), dtype=np.int64)
    for gb in range(8):
        m, k = divmod(gb, 4)
        by, bx = divmod(k, 2)
        Y[by * 8:by * 8 + 8, m * 16 + bx * 8:m * 16 + bx * 8 + 8] = \
            _block_pixels(yb[gb], jpeg_qtab_natural(), basis)
    Cb = np.zeros((8, 16), dtype=np.int64)
    Cr = np.zeros((8, 16), dtype=np.int64)
    for m in range(2):
        Cb[:, m * 8:m * 8 + 8] = _block_pixels(
            cbb[m], jpeg_qtab_chroma_natural(), basis)
        Cr[:, m * 8:m * 8 + 8] = _block_pixels(
            crb[m], jpeg_qtab_chroma_natural(), basis)
    cb = Cb.repeat(2, 0).repeat(2, 1)
    cr = Cr.repeat(2, 0).repeat(2, 1)
    r, g, b = _ycc_to_rgb(Y, cb, cr)
    return np.stack([r, g, b], axis=2)


def test_color_jpeg_roundtrip_equals_coefficient_reference():
    for mid in (0, 1, 7, 31, 101, 254, 255, 499):
        yb, cbb, crb = synth_jpeg_color_coeffs(mid)
        rgb = decode_jpeg_color(encode_jpeg_color(yb, cbb, crb, 32, 16))
        assert rgb.shape == (16, 32, 3)
        assert (rgb == _reference_rgb(mid)).all(), f"media_id {mid}"


def test_color_jpeg_dc_prediction_carries_across_mcus():
    # identical blocks in both MCUs would hide a broken predictor; the
    # synthetic plan guarantees different DCs per gb — assert that,
    # and that the second MCU's pixels still decode exactly
    yb, cbb, crb = synth_jpeg_color_coeffs(42)
    assert yb[0][0] != yb[4][0] or cbb[0][0] != cbb[1][0]
    rgb = decode_jpeg_color(encode_jpeg_color(yb, cbb, crb, 32, 16))
    assert (rgb[:, 16:, :] == _reference_rgb(42)[:, 16:, :]).all()


def test_color_jpeg_rejects_wrong_shapes():
    yb, cbb, crb = synth_jpeg_color_coeffs(3)
    content = bytearray(encode_jpeg_color(yb, cbb, crb, 32, 16))
    with pytest.raises(ValueError):
        decode_jpeg_color(b"\x00\x01" + bytes(content[2:]))  # no SOI
    # grayscale decoder must refuse a 3-component stream and vice versa
    from pmc_conversion_spark.functions.multimodal import (
        decode_jpeg_gray, encode_jpeg_gray, synth_jpeg_coeffs)
    with pytest.raises(ValueError):
        decode_jpeg_gray(bytes(content))
    gray = encode_jpeg_gray(synth_jpeg_coeffs(3), 16, 8)
    with pytest.raises(ValueError):
        decode_jpeg_color(gray)
    # non-4:2:0 sampling is an HONEST NotImplementedError gate: patch
    # the SOF0 sampling byte of the color stream to 1x1 luma
    sof = bytes(content).index(b"\xFF\xC0")
    assert content[sof + 11] == 0x22
    content[sof + 11] = 0x11
    with pytest.raises(NotImplementedError):
        decode_jpeg_color(bytes(content))


def test_ycc_to_rgb_matches_float_reference_within_one():
    # the fixed-point convert must track the real-valued BT.601
    # formulas to ≤1 LSB over the full cube corners + a lattice
    ys, cs = np.arange(0, 256, 17), np.arange(0, 256, 17)
    Y, Cb, Cr = np.meshgrid(ys, cs, cs, indexing="ij")
    r, g, b = _ycc_to_rgb(Y.astype(np.int64), Cb.astype(np.int64),
                          Cr.astype(np.int64))
    rf = np.clip(np.round(Y + 1.402 * (Cr - 128)), 0, 255)
    gf = np.clip(np.round(Y - 0.344136 * (Cb - 128)
                          - 0.714136 * (Cr - 128)), 0, 255)
    bf = np.clip(np.round(Y + 1.772 * (Cb - 128)), 0, 255)
    assert int(np.abs(r - rf).max()) <= 1
    assert int(np.abs(g - gf).max()) <= 1
    assert int(np.abs(b - bf).max()) <= 1


def test_palette_png_roundtrip_and_spec_gates():
    from pmc_conversion_spark.functions.multimodal import (
        _png_chunk, decode_png_gray, decode_png_palette,
        encode_png_gray, encode_png_palette, synth_png_palette,
        synth_png_pixels)
    for mid in (0, 5, 77, 250, 499):
        idx = synth_png_pixels(mid, 24, 16)
        pal = synth_png_palette(mid)
        rgb = decode_png_palette(encode_png_palette(idx, pal))
        assert (rgb == pal[idx]).all()
    # the colour-type gates are symmetric NotImplementedError, so a
    # caller routed to the wrong decoder fails loud, not wrong
    g = encode_png_gray(synth_png_pixels(1, 24, 16))
    p = encode_png_palette(synth_png_pixels(1, 24, 16),
                           synth_png_palette(1))
    with pytest.raises(NotImplementedError):
        decode_png_palette(g)
    with pytest.raises(NotImplementedError):
        decode_png_gray(p)
    # spec rules: PLTE after IDAT, malformed PLTE, missing PLTE
    import struct
    body = bytearray(p)
    plte_at = bytes(body).index(b"PLTE") - 4
    plte_len = struct.unpack(">I", body[plte_at:plte_at + 4])[0] + 12
    plte = bytes(body[plte_at:plte_at + plte_len])
    no_plte = bytes(body[:plte_at]) + bytes(body[plte_at + plte_len:])
    with pytest.raises(ValueError):
        decode_png_palette(no_plte)
    late_plte = no_plte[:-12] + plte + no_plte[-12:]  # before IEND
    with pytest.raises(ValueError):
        decode_png_palette(late_plte)
    bad_plte = (bytes(body[:plte_at]) + _png_chunk(b"PLTE", b"\x01\x02")
                + bytes(body[plte_at + plte_len:]))
    with pytest.raises(ValueError):
        decode_png_palette(bad_plte)


def test_gif89a_interlaced_local_table_roundtrip():
    """GIF89a: extensions walked, LOCAL (reversed) color table
    honored over the global decoy, 4-pass interlace undone."""
    from pmc_conversion_spark.functions.multimodal import (
        _gif_interlace_order, decode_gif_gray,
        encode_gif89a_interlaced, synth_gif_pixels)
    for mid in (0, 7, 123, 499):
        px = synth_gif_pixels(mid, 19, 13)
        assert (decode_gif_gray(encode_gif89a_interlaced(px))
                == px).all()
    # the interlace row order itself, against the spec table
    assert _gif_interlace_order(13) == [0, 8, 4, 12, 2, 6, 10,
                                        1, 3, 5, 7, 9, 11]
    # extension blocks are an 89a feature: the same stream relabeled
    # 87a must be REJECTED, not skipped
    blob = bytearray(encode_gif89a_interlaced(
        synth_gif_pixels(1, 19, 13)))
    blob[4:5] = b"7"
    with pytest.raises(ValueError):
        decode_gif_gray(bytes(blob))


def test_gif89a_truncation_uniform_valueerror():
    from pmc_conversion_spark.functions.multimodal import (
        decode_gif_gray, encode_gif89a_interlaced, synth_gif_pixels)
    full = encode_gif89a_interlaced(synth_gif_pixels(42, 19, 13))
    for cut in range(1, len(full), 23):
        with pytest.raises(ValueError):
            decode_gif_gray(full[:cut])


def test_png_adam7_roundtrip_and_pass_layout():
    from pmc_conversion_spark.functions.multimodal import (
        decode_png_gray, encode_png_gray_adam7, synth_png_pixels)
    # ragged + degenerate sizes: empty passes, single-pixel image,
    # exact 8x8 grid
    for w, h in ((21, 11), (1, 1), (8, 8), (7, 3), (2, 9), (16, 2)):
        px = synth_png_pixels(99, w, h)
        assert (decode_png_gray(encode_png_gray_adam7(px))
                == px).all(), (w, h)


def test_png_adam7_stream_length_is_validated():
    """Extra or missing pass bytes must fail loud (the per-pass walk
    checks both under- and over-length streams)."""
    import struct
    import zlib
    from pmc_conversion_spark.functions.multimodal import (
        _png_body, _png_filter_rows, decode_png_gray, synth_png_pixels,
        _ADAM7)
    px = synth_png_pixels(5, 21, 11)
    raw = bytearray()
    for r0, c0, rs, cs in _ADAM7:
        sub = px[r0::rs, c0::cs]
        if sub.shape[0] and sub.shape[1]:
            raw += _png_filter_rows(sub)
    ihdr = struct.pack(">IIBBBBB", 21, 11, 8, 0, 0, 0, 1)
    with pytest.raises(ValueError):
        decode_png_gray(_png_body(ihdr, [], zlib.compress(
            bytes(raw[:-5]), 6)))
    with pytest.raises(ValueError):
        decode_png_gray(_png_body(ihdr, [], zlib.compress(
            bytes(raw) + b"\x00\x00\x00", 6)))


def test_jpeg_progressive_matches_sequential_pixels():
    """Progressive transmission reorders information but loses none:
    SOF2 bytes of a coefficient plan must decode pixel-identically to
    a SOF0 (sequential) encode of the same blocks."""
    from pmc_conversion_spark.functions.multimodal import (
        decode_jpeg_gray, decode_jpeg_gray_progressive,
        encode_jpeg_gray, encode_jpeg_gray_progressive,
        synth_jpeg_prog_coeffs)
    for m in (0, 1, 31, 32, 123, 499):     # odd+even DCs: the Al=1
        blocks = synth_jpeg_prog_coeffs(m)  # pass hides a real bit
        prog = decode_jpeg_gray_progressive(
            encode_jpeg_gray_progressive(blocks, 32, 8))
        seq = decode_jpeg_gray(encode_jpeg_gray(blocks, 32, 8))
        assert (prog == seq).all()


def test_jpeg_progressive_scan_structure_and_gates():
    import struct
    from pmc_conversion_spark.functions.multimodal import (
        JPEG_AC_VALS_P, decode_jpeg_gray, decode_jpeg_gray_progressive,
        encode_jpeg_gray, encode_jpeg_gray_progressive,
        synth_jpeg_prog_coeffs)
    blocks = synth_jpeg_prog_coeffs(5)
    blob = encode_jpeg_gray_progressive(blocks, 32, 8)
    # six SOS scans with the documented band/approximation params:
    # DC first @ Al=1, both AC bands first @ Al=1, DC refinement,
    # both AC refinements Ah=1->Al=0
    scans = []
    p = 0
    while True:
        i = blob.find(b"\xFF\xDA", p)
        if i < 0:
            break
        ln = struct.unpack_from(">H", blob, i + 2)[0]
        scans.append(tuple(blob[i + 2 + ln - 3:i + 2 + ln]))
        p = i + 2
    assert scans == [(0, 0, 0x01), (1, 8, 0x01), (9, 63, 0x01),
                     (0, 0, 0x10), (1, 8, 0x10), (9, 63, 0x10)]
    # the scan-local AC alphabet is complete and duplicate-free
    assert len(JPEG_AC_VALS_P) == 176
    assert len(set(JPEG_AC_VALS_P)) == 176
    # cross-routing gates fail loud in both directions
    with pytest.raises(ValueError):
        decode_jpeg_gray(blob)
    with pytest.raises(ValueError):
        decode_jpeg_gray_progressive(encode_jpeg_gray(blocks, 32, 8))
    # truncation anywhere raises ValueError, never IndexError
    for cut in range(2, len(blob), 41):
        with pytest.raises(ValueError):
            decode_jpeg_gray_progressive(blob[:cut])


@pytest.mark.slow
def test_tdigest_batch_properties(spark):
    """Sorted-build t-digest: ≤ δ clusters, contiguous non-overlapping
    value ranges, tail clusters tighter (in mass) than the middle, and
    the build is partitioning-independent."""
    import __spark_entry__ as E
    from pyspark.sql import functions as F
    sf = "/root/testdata/sf0.001"
    q = E.queries()["sketch_tdigest_batch"]
    rows = sorted(q(spark, sf).collect(), key=lambda r: r["cluster"])
    assert 2 <= len(rows) <= 100
    total = sum(r["n_pts"] for r in rows)
    # contiguous, ordered, non-overlapping cents ranges
    for a, b in zip(rows, rows[1:]):
        assert a["hi_cents"] <= b["lo_cents"]
        assert a["lo_cents"] <= a["hi_cents"]
    # k' vanishes at the extremes: the first and last clusters must
    # hold less mass than the fattest middle cluster
    mid = max(r["n_pts"] for r in rows[2:-2])
    assert rows[0]["n_pts"] < mid and rows[-1]["n_pts"] < mid
    # and the extreme clusters stay small in absolute terms (q² scale:
    # first cluster mass ≈ n·sqrt(1/(2δ·)) … bounded well under n/δ·4)
    assert rows[0]["n_pts"] <= total // 10
    # partitioning-invariance: a repartitioned rebuild is identical
    li = spark.read.parquet(f"{sf}/lineitem.parquet").repartition(13)
    li.createOrReplaceTempView("____tmp_unused")  # keep lineage real
    again = sorted(q(spark, sf).collect(), key=lambda r: r["cluster"])
    assert again == rows


def test_jpeg_progressive_ac_refinement_randomized():
    """The AC successive-approximation coder (T.81's hardest part)
    against randomized dense/sparse blocks: progressive bytes must
    decode pixel-identically to a sequential encode — every corner of
    the correction-bit buffering, ZRL splitting at correction
    coefficients, and EOB runs with owed bits shows up as a pixel
    diff if wrong."""
    import numpy as np
    from pmc_conversion_spark.functions.multimodal import (
        decode_jpeg_gray, decode_jpeg_gray_progressive,
        encode_jpeg_gray, encode_jpeg_gray_progressive)
    rng = np.random.RandomState(1234)
    for _ in range(200):
        blocks = []
        for _b in range(4):
            zz = [0] * 64
            zz[0] = int(rng.randint(-40, 40))
            for z in rng.choice(range(1, 64),
                                size=rng.randint(0, 14),
                                replace=False):
                v = int(rng.randint(-31, 32))
                zz[int(z)] = v if v else 1
            blocks.append(zz)
        prog = decode_jpeg_gray_progressive(
            encode_jpeg_gray_progressive(blocks, 32, 8))
        seq = decode_jpeg_gray(encode_jpeg_gray(blocks, 32, 8))
        assert (prog == seq).all()
