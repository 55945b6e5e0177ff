#!/usr/bin/env python3
"""Export the qb39-qb46 media re-derivations as TYPED parquet fixtures.

The eight media lanes were rows-only + GoldenSpec-md5-pinned through round
13 because no DuckDB function can decode PNG/WAV/GIF payloads. This script
closes that gap with the qb34 precedent (tools/gen_bangumi_parsed.py): the
INDEPENDENT pure-Python re-derivation (tools/rederive_media.py — from-
scratch inflate/unfilter/LZW/Goertzel decoders, no JVM, none of the Scala
code under test) is exported per lane as a typed parquet under
tools/fixtures/, and SparkEntry.oracleSql replays each lane's relational
tail over it in DuckDB — plain SELECTs for the decode-boundary lanes
(qb39-qb44, whose entire output IS the decode), and a re-derived
brute-force Hamming JOIN for the near-dup lanes (qb45/qb46, where the
fixture carries only per-media 64-bit fingerprints and DuckDB re-runs the
all-pairs xor/bit_count — independently re-proving the Scala side's
C(6,3) blocking exactness inside the driver's own gate).

Linkage to the pins: before writing anything, every lane's typed rows are
rendered through GoldenSpec's canonical form and the md5 MUST equal
tools/rederive_media.py's pinned value — so the parquet is byte-equivalent
to the proven re-derivation, not a second implementation that could drift.

Array columns (histogram/rms/band_amp) are stored as the same to_json
STRINGS the Spark lanes emit (rederive_media.jarr reproduces Spark's
java.lang.Double.toString rendering exactly — pin-proven), so the driver's
pandas compare only ever sees scalar cells.

Usage:
  sbt "runMain graft.MediaDump /tmp/media_dump"   # once, payload dump
  python3 tools/gen_media_fixtures.py [/tmp/media_dump]

Exits nonzero on any pin mismatch; writes nothing in that case.
"""
import os
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

sys.argv = sys.argv[:1]  # rederive_media reads sys.argv[1] as its dump dir
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import rederive_media as rm  # noqa: E402

DUMP = sys.argv[1] if len(sys.argv) > 1 else "/tmp/media_dump"
HERE = os.path.dirname(os.path.abspath(__file__))
FIXDIR = os.path.join(HERE, "fixtures")

OW, OH = 16, 12  # qb44 resize target


def wrap64(v: int) -> int:
    """unsigned 64-bit fingerprint -> signed two's-complement BIGINT."""
    return v - (1 << 64) if v >= (1 << 63) else v


# ---- typed lane builders (same decode calls as rederive_media's lanes) ----

def t_qb39(rows):
    out = []
    for media_id, _k, _m, content in rows:
        try:
            w, h, rgb = rm.png_decode_first(bytes(content))
            hist = rm.lum_histogram_rgbrows(w, h, rgb)
            out.append(dict(media_id=media_id, width=w, height=h,
                            histogram=rm.jarr(hist), decode_error=False))
        except Exception:
            out.append(dict(media_id=media_id, width=-1, height=-1,
                            histogram="[]", decode_error=True))
    return out


def t_qb44(rows):
    out = []
    for media_id, _k, _m, content in rows:
        try:
            w, h, rgb = rm.png_decode_first(bytes(content))
            counts = [0] * 8
            for y in range(OH):
                row = rgb[(y * h) // OH]
                for x in range(OW):
                    sx = (x * w) // OW
                    r, g, b = row[3 * sx], row[3 * sx + 1], row[3 * sx + 2]
                    lum = (r * 299 + g * 587 + b * 114) // 1000
                    counts[lum >> 5] += 1
            hist = [c / (OW * OH) for c in counts]
            out.append(dict(media_id=media_id, src_width=w, src_height=h,
                            width=OW, height=OH, histogram=rm.jarr(hist),
                            decode_error=False))
        except Exception:
            out.append(dict(media_id=media_id, src_width=-1, src_height=-1,
                            width=-1, height=-1, histogram="[]",
                            decode_error=True))
    return out


def t_qb40(rows):
    sig = rm.PNG_SIG
    out = []
    for media_id, kind, _m, content in rows:
        if kind != "video":
            continue
        content = bytes(content)
        starts, i = [], 0
        while i <= len(content) - len(sig):
            if content[i:i + len(sig)] == sig:
                starts.append(i)
                i += len(sig)
            else:
                i += 1
        if not starts:
            continue
        bounds = starts + [len(content)]
        take = min(4, len(starts))
        for k in range(take):
            f = k * len(starts) // take
            out.append(dict(media_id=media_id, frame_no=k,
                            frame_bytes=content[bounds[f]:bounds[f + 1]]
                            .hex().upper()))
    return out


def t_qb41(rows):
    import math
    out = []
    for media_id, _k, _m, content in rows:
        try:
            rate, nch, pcm = rm.wav_samples(bytes(content))
            nframes = len(pcm) // (2 * nch)
            sumsq = [0] * nch
            for f in range(nframes):
                for c in range(nch):
                    s = rm.s16(pcm, f * nch + c)
                    sumsq[c] += s * s
            rms = [0.0 if nframes == 0
                   else math.sqrt(float(sq) / nframes) / 32768.0
                   for sq in sumsq]
            out.append(dict(media_id=media_id, sample_rate=rate,
                            channels=nch,
                            duration_ms=nframes * 1000 // rate,
                            rms=rm.jarr(rms), decode_error=False))
        except Exception:
            out.append(dict(media_id=media_id, sample_rate=-1, channels=-1,
                            duration_ms=-1, rms="[]", decode_error=True))
    return out


def t_qb42(rows):
    out = []
    for media_id, _k, _m, content in rows:
        try:
            for f, total, w, h, hist in rm.gif_sampled_histograms(
                    bytes(content), 3):
                out.append(dict(media_id=media_id, frame_no=f,
                                n_frames=total, width=w, height=h,
                                histogram=rm.jarr(hist), decode_error=False))
        except Exception:
            out.append(dict(media_id=media_id, frame_no=-1, n_frames=-1,
                            width=-1, height=-1, histogram="[]",
                            decode_error=True))
    return out


def t_qb43(rows, window_ms=20, freqs=(440.0, 1000.0, 2500.0)):
    import math
    out = []
    for media_id, _k, _m, content in rows:
        try:
            rate, nch, pcm = rm.wav_samples(bytes(content))
            nframes = len(pcm) // (2 * nch)
            if nframes == 0:
                raise ValueError("empty audio stream")
            win = max(1, rate * window_ms // 1000)
            nwin = (nframes + win - 1) // win
            coeffs = [2.0 * math.cos(2.0 * math.pi * f / rate)
                      for f in freqs]
            for wi in range(nwin):
                lo = wi * win
                hi = min(nframes, lo + win)
                n = hi - lo
                s1 = [0.0] * len(coeffs)
                s2 = [0.0] * len(coeffs)
                sumsq = 0.0
                for i in range(lo, hi):
                    acc = 0.0
                    for c in range(nch):
                        acc += rm.s16(pcm, i * nch + c)
                    x = acc / nch / 32768.0
                    sumsq += x * x
                    for k, coeff in enumerate(coeffs):
                        s0 = x + coeff * s1[k] - s2[k]
                        s2[k] = s1[k]
                        s1[k] = s0
                bands = [math.sqrt(max(s1[k] * s1[k] + s2[k] * s2[k]
                                       - coeffs[k] * s1[k] * s2[k], 0.0))
                         * 2.0 / n for k in range(len(coeffs))]
                out.append(dict(media_id=media_id, frame_no=wi,
                                n_frames=nwin,
                                start_ms=lo * 1000 // rate,
                                rms=math.sqrt(sumsq / n),
                                band_amp=rm.jarr(bands),
                                decode_error=False))
        except Exception:
            out.append(dict(media_id=media_id, frame_no=-1, n_frames=-1,
                            start_ms=-1, rms=-1.0, band_amp="[]",
                            decode_error=True))
    return out


def t_qb45_sigs(rows):
    return [dict(media_id=media_id,
                 fp=wrap64(rm.dhash_png(bytes(content))),
                 decode_error=False)
            for media_id, _k, _m, content in rows]


def t_qb46_sigs(rows):
    out = []
    for media_id, _k, _m, content in rows:
        try:
            out.append(dict(media_id=media_id,
                            fp=wrap64(rm.audio_dhash(bytes(content))),
                            decode_error=False))
        except Exception:
            out.append(dict(media_id=media_id, fp=0, decode_error=True))
    return out


# ---- canonical rendering of typed rows (must reproduce the pins) ----

def cell(v):
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, bytes):
        return v.hex().upper()
    if isinstance(v, float):
        return rm.jdouble(v)
    return str(v)


def render(rows):
    return [rm.SEP.join(cell(r[k]) for k in sorted(r)) for r in rows]


def pairs_from_sigs(sigs, max_dist=3):
    """Brute-force Hamming pairs over live fingerprints — the same
    re-derivation rederive_media.qb45/qb46 pin, off the TYPED fixture."""
    live = [(s["media_id"], s["fp"] & ((1 << 64) - 1))
            for s in sigs if not s["decode_error"]]
    out = []
    for i in range(len(live)):
        for j in range(i + 1, len(live)):
            (ia, va), (ib, vb) = live[i], live[j]
            if ia > ib:
                (ia, va), (ib, vb) = (ib, vb), (ia, va)
            d = bin(va ^ vb).count("1")
            if d <= max_dist:
                out.append(dict(hamming=d, id_a=ia, id_b=ib))
    return out


SCHEMAS = {
    "qb39_media_decode": pa.schema([
        ("media_id", pa.int64()), ("width", pa.int32()),
        ("height", pa.int32()), ("histogram", pa.string()),
        ("decode_error", pa.bool_())]),
    "qb40_media_frames": pa.schema([
        ("media_id", pa.int64()), ("frame_no", pa.int32()),
        ("frame_bytes", pa.string())]),
    "qb41_audio_decode": pa.schema([
        ("media_id", pa.int64()), ("sample_rate", pa.int32()),
        ("channels", pa.int32()), ("duration_ms", pa.int64()),
        ("rms", pa.string()), ("decode_error", pa.bool_())]),
    "qb42_gif_frames": pa.schema([
        ("media_id", pa.int64()), ("frame_no", pa.int32()),
        ("n_frames", pa.int32()), ("width", pa.int32()),
        ("height", pa.int32()), ("histogram", pa.string()),
        ("decode_error", pa.bool_())]),
    "qb43_audio_frames": pa.schema([
        ("media_id", pa.int64()), ("frame_no", pa.int32()),
        ("n_frames", pa.int32()), ("start_ms", pa.int64()),
        ("rms", pa.float64()), ("band_amp", pa.string()),
        ("decode_error", pa.bool_())]),
    "qb44_media_resize": pa.schema([
        ("media_id", pa.int64()), ("src_width", pa.int32()),
        ("src_height", pa.int32()), ("width", pa.int32()),
        ("height", pa.int32()), ("histogram", pa.string()),
        ("decode_error", pa.bool_())]),
    "media_sigs_qb45": pa.schema([
        ("media_id", pa.int64()), ("fp", pa.int64()),
        ("decode_error", pa.bool_())]),
    "media_sigs_qb46": pa.schema([
        ("media_id", pa.int64()), ("fp", pa.int64()),
        ("decode_error", pa.bool_())]),
}


def main() -> int:
    def load(sub):
        return duckdb.sql(
            f"SELECT media_id, kind, mime, content "
            f"FROM read_parquet('{DUMP}/{sub}/*.parquet') ORDER BY media_id"
        ).fetchall()

    try:
        media = load("media")
        neardup = load("neardup")
        audio = load("audio")
        audio_neardup = load("audio_neardup")
        gif = load("gif")
    except Exception as e:
        print(f"[fixtures] dump missing under {DUMP} ({e}); run\n"
              f"  sbt 'runMain graft.MediaDump {DUMP}'", file=sys.stderr)
        return 2

    sigs45 = t_qb45_sigs(neardup)
    sigs46 = t_qb46_sigs(audio_neardup)
    typed = {
        "qb39_media_decode": t_qb39(media),
        "qb40_media_frames": t_qb40(media[:60]),
        "qb41_audio_decode": t_qb41(audio),
        "qb42_gif_frames": t_qb42(gif),
        "qb43_audio_frames": t_qb43(audio),
        "qb44_media_resize": t_qb44(media),
    }
    # pin linkage: canonical md5 of the typed rows (and, for the near-dup
    # lanes, of the pairs derived FROM the typed fingerprints) must equal
    # the independently pinned values before anything is written
    checks = dict(typed)
    checks["qb45_image_neardup"] = pairs_from_sigs(sigs45)
    checks["qb46_audio_neardup"] = pairs_from_sigs(sigs46)
    bad = 0
    for name, rows in checks.items():
        got = rm.canon_md5(render(rows))
        ok = got == rm.PINS[name]
        print(f"[fixtures] {'OK  ' if ok else 'MISS'} {name}: "
              f"{len(rows)} rows, md5 {got}"
              + ("" if ok else f" != pinned {rm.PINS[name]}"))
        bad += 0 if ok else 1
    if bad:
        print("[fixtures] pin mismatch — NOT writing fixtures",
              file=sys.stderr)
        return 1

    os.makedirs(FIXDIR, exist_ok=True)
    writes = dict(typed)
    writes["media_sigs_qb45"] = sigs45
    writes["media_sigs_qb46"] = sigs46
    for name, rows in writes.items():
        schema = SCHEMAS[name]
        path = os.path.join(FIXDIR, f"{name}.parquet")
        pq.write_table(pa.Table.from_pylist(rows, schema=schema), path)
        print(f"[fixtures] wrote {len(rows)} rows -> {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
