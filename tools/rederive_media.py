#!/usr/bin/env python3
"""Independent re-derivation for the qb39-qb46 media golden pins.

GoldenSpec's md5 pins for the media lanes were generated from the Scala
implementation (JDK ImageIO / javax.sound decode), which makes them a
regression lock but not a correctness proof. This script converts them into
one: starting from the raw fixture PAYLOADS (dumped by `graft.MediaDump` —
generators only, none of the decode code under test), it re-runs all five
queries with from-scratch pure-Python decoders and checks the canonical
md5s against the pins. No Spark, no repo Scala, no JVM decode:

  - PNG: zlib inflate + per-row unfilter (all five filter types, color
    type 2 / 8-bit, hand-parsed chunks) — not ImageIO;
  - WAV: RIFF/data chunk parse via the stdlib `wave` module, 16-bit LE
    samples decoded by hand, per-channel RMS accumulated in exact ints;
  - GIF: hand-written LZW decoder + palette lookup + frame compositing
    honoring all three GIF89a disposal methods and frame offsets — not
    ImageIO;
  - Goertzel: the single-bin DFT recurrence in plain Python floats,
    replicating the Scala operator's evaluation order exactly;
  - luminance histogram: integer Rec.601 weights, 8 bins.

Float rendering: Spark renders doubles (CAST to string, to_json) the way
java.lang.Double.toString does — plain decimal with a mandatory fraction
digit for 1e-3 <= |x| < 1e7, otherwise d.dddE±e scientific. jdouble()
reproduces that from Python's shortest-round-trip repr.

Canonical form (GoldenSpec.goldenHash): columns sorted by name, binary
rendered as UPPERCASE hex, values cast to string, null -> "\\x00", cells
joined with "\\x01", lines sorted, md5 over line+"\\n" UTF-8 bytes.

Usage:
  sbt "runMain graft.MediaDump /tmp/media_dump"   # once, fixture dump
  python3 tools/rederive_media.py [/tmp/media_dump]

Exits nonzero on any pin mismatch.
"""
import hashlib
import math
import struct
import sys
import zlib
from decimal import Decimal

import duckdb

DUMP = sys.argv[1] if len(sys.argv) > 1 else "/tmp/media_dump"

PINS = {
    "qb39_media_decode": "25e02cd1cd7c9b220e8b62ec909cae4a",
    "qb40_media_frames": "8efb0e0e6cbcabb7460ace1700df13bc",
    "qb41_audio_decode": "299509c402eb2079b07dc148486fa166",
    "qb42_gif_frames": "cad4d5403e4c7c38d9c87607504e2363",
    "qb43_audio_frames": "9db61daff551800547618bd7e6bc6ca1",
    "qb44_media_resize": "b96dda5cd25a90120f06ce2e782535d8",
    "qb45_image_neardup": "a69dce4d831193f8c1276695ea704693",
    "qb46_audio_neardup": "0735e37f553398c4dcd791ba409abd7e",
}

SEP = "\x01"


# ---------------------------------------------------------------- rendering

def jdouble(x: float) -> str:
    """java.lang.Double.toString / Spark double rendering."""
    if x != x:
        return "NaN"
    if x == float("inf"):
        return "Infinity"
    if x == float("-inf"):
        return "-Infinity"
    if x == 0.0:
        return "-0.0" if math.copysign(1.0, x) < 0 else "0.0"
    sign = "-" if x < 0 else ""
    d = Decimal(repr(abs(x)))  # shortest round-trip digits
    tup = d.as_tuple()
    digits = "".join(map(str, tup.digits))
    e = tup.exponent + len(digits) - 1  # scientific exponent
    if -3 <= e <= 6:  # plain decimal, mandatory fraction digit
        if e >= len(digits) - 1:
            return f"{sign}{digits + '0' * (e - (len(digits) - 1))}.0"
        if e >= 0:
            return f"{sign}{digits[: e + 1]}.{digits[e + 1:]}"
        return f"{sign}0.{'0' * (-e - 1)}{digits}"
    mant = digits[0] + "." + (digits[1:] or "0")
    return f"{sign}{mant}E{e}"


def jarr(vals) -> str:
    """Spark to_json rendering of array<double>."""
    return "[" + ",".join(jdouble(v) for v in vals) + "]"


def canon_md5(lines) -> str:
    md = hashlib.md5()
    for line in sorted(lines):
        md.update((line + "\n").encode("utf-8"))
    return md.hexdigest()


# ------------------------------------------------------------- PNG decoding

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def png_decode_first(data: bytes):
    """Decode the FIRST PNG image in `data` (a concatenated payload reads
    its first frame, matching ImageIO.read). Returns (w, h, rgb rows).
    Supports what the JDK writer emits for TYPE_INT_RGB: 8-bit color
    type 2, non-interlaced."""
    if not data.startswith(PNG_SIG):
        raise ValueError("not a PNG")
    pos = len(PNG_SIG)
    w = h = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color != 2 or interlace != 0:
                raise ValueError(f"unsupported PNG: depth={depth} color={color}")
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if w is None:
        raise ValueError("no IHDR")
    raw = zlib.decompress(bytes(idat))
    bpp = 3
    stride = w * bpp
    rows = []
    prev = bytearray(stride)
    off = 0
    for _ in range(h):
        ft = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        off += 1 + stride
        if ft == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ft != 0:
            raise ValueError(f"bad filter {ft}")
        rows.append(bytes(line))
        prev = line
    return w, h, rows


def lum_histogram_rgbrows(w: int, h: int, rows) -> list:
    """8-bin integer-Rec.601 luminance histogram over RGB byte rows."""
    counts = [0] * 8
    for row in rows:
        for x in range(w):
            r, g, b = row[3 * x], row[3 * x + 1], row[3 * x + 2]
            lum = (r * 299 + g * 587 + b * 114) // 1000
            counts[lum >> 5] += 1
    total = w * h
    return [c / total for c in counts]


# ------------------------------------------------------------- GIF decoding

def gif_lzw_decode(min_code_size: int, data: bytes) -> bytes:
    """From-scratch GIF LZW decompressor -> color index stream."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    table = [bytes([i]) for i in range(clear)] + [b"", b""]
    code_size = min_code_size + 1
    acc = nbits = 0
    prev = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                code_size = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            else:  # the KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            out += entry
            prev = entry
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
    return bytes(out)


def gif_frames(data: bytes):
    """Parse a GIF container: yields logical screen (w, h) and a list of
    frames (left, top, w, h, disposal, transparent_index, indices, palette).
    disposal uses raw GIF semantics: 0/1 leave, 2 restore-background,
    3 restore-previous."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = data[pos : pos + 3 * n]
        pos += 3 * n
    frames = []
    disposal = 0
    transparent = None
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                size = data[pos]
                gce = data[pos + 1 : pos + 1 + size]
                pos += 1 + size
                disposal = (gce[0] >> 2) & 7
                transparent = gce[3] if (gce[0] & 1) else None
            # skip (remaining) sub-blocks
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            left, top, fw, fh, iflags = struct.unpack("<HHHHB", data[pos : pos + 9])
            pos += 9
            interlaced = bool(iflags & 0x40)  # the JDK writer interlaces
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                pal = data[pos : pos + 3 * n]
                pos += 3 * n
            min_code = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos] != 0:
                size = data[pos]
                lzw += data[pos + 1 : pos + 1 + size]
                pos += 1 + size
            pos += 1
            idx = gif_lzw_decode(min_code, bytes(lzw))
            if interlaced:  # rows arrive in the four GIF interlace passes
                order = (list(range(0, fh, 8)) + list(range(4, fh, 8)) +
                         list(range(2, fh, 4)) + list(range(1, fh, 2)))
                deint = bytearray(fw * fh)
                for src, dest in enumerate(order):
                    deint[dest * fw : (dest + 1) * fw] = \
                        idx[src * fw : (src + 1) * fw]
                idx = bytes(deint)
            frames.append((left, top, fw, fh, disposal, transparent, idx, pal))
            disposal = 0
            transparent = None
        else:
            raise ValueError(f"bad GIF block 0x{b:02x}")
    if not frames:
        raise ValueError("no frames")
    if sw <= 0 or sh <= 0:
        sw, sh = frames[0][2], frames[0][3]
    return sw, sh, frames


def gif_sampled_histograms(data: bytes, n: int):
    """demuxGif replica: composite frames on a black RGB canvas honoring
    disposal methods; return (frame_no, total, w, h, histogram) for `n`
    evenly spaced frames."""
    sw, sh, frames = gif_frames(data)
    total = len(frames)
    take = min(n, total)
    sampled = {k * total // take for k in range(take)}
    canvas = [bytearray(3 * sw) for _ in range(sh)]  # opaque black
    out = []
    for f in range(max(sampled) + 1):
        left, top, fw, fh, disposal, transparent, idx, pal = frames[f]
        saved = [bytearray(row) for row in canvas] if disposal == 3 else None
        for y in range(fh):
            cy = top + y
            if not 0 <= cy < sh:
                continue
            row = canvas[cy]
            for x in range(fw):
                cx = left + x
                if not 0 <= cx < sw:
                    continue
                ci = idx[y * fw + x]
                if transparent is not None and ci == transparent:
                    continue  # SRC_OVER: transparent pixel leaves the canvas
                row[3 * cx : 3 * cx + 3] = pal[3 * ci : 3 * ci + 3]
        if f in sampled:
            hist = lum_histogram_rgbrows(sw, sh, canvas)
            out.append((f, total, sw, sh, hist))
        if disposal == 2:  # restore frame rect to (opaque-black) background
            for y in range(fh):
                cy = top + y
                if not 0 <= cy < sh:
                    continue
                for x in range(fw):
                    cx = left + x
                    if 0 <= cx < sw:
                        canvas[cy][3 * cx : 3 * cx + 3] = b"\x00\x00\x00"
        elif disposal == 3:
            canvas = saved
    return out


# ------------------------------------------------------------- WAV decoding

def wav_samples(data: bytes):
    """Parse a 16-bit PCM WAV -> (rate, n_channels, list of frame tuples is
    avoided: returns raw little-endian sample bytes + counts)."""
    import io
    import wave

    with wave.open(io.BytesIO(data)) as wf:
        if wf.getsampwidth() != 2:
            raise ValueError("not 16-bit")
        rate = wf.getframerate()
        nch = wf.getnchannels()
        pcm = wf.readframes(wf.getnframes())
    return rate, nch, pcm


def s16(pcm: bytes, i: int) -> int:
    """Little-endian signed 16-bit sample i."""
    v = pcm[2 * i] | (pcm[2 * i + 1] << 8)
    return v - 65536 if v >= 32768 else v


# ------------------------------------------------------------------- lanes


def qb39(rows):
    """decodeImages over syntheticMedia(200): first-PNG dims + histogram."""
    lines = []
    for media_id, _kind, _mime, content in rows:
        try:
            w, h, rgb = png_decode_first(content)
            hist = lum_histogram_rgbrows(w, h, rgb)
            rec = ("false", str(h), jarr(hist), str(media_id), str(w))
        except Exception:
            rec = ("true", "-1", "[]", str(media_id), "-1")
        # columns sorted: decode_error, height, histogram, media_id, width
        lines.append(SEP.join(rec))
    return lines


def qb44(rows):
    """resizeImages(syntheticMedia(200), 16, 12): nearest-neighbor resample
    with integer source indexing src=(dst*srcDim)//outDim, then the 8-bin
    luminance histogram over the RESIZED pixels. Columns sorted:
    decode_error, height, histogram, media_id, src_height, src_width,
    width."""
    OW, OH = 16, 12
    lines = []
    for media_id, _kind, _mime, content in rows:
        try:
            w, h, rgb = png_decode_first(content)
            counts = [0] * 8
            for y in range(OH):
                row = rgb[(y * h) // OH]
                for x in range(OW):
                    sx = (x * w) // OW
                    r, g, b = row[3 * sx], row[3 * sx + 1], row[3 * sx + 2]
                    lum = (r * 299 + g * 587 + b * 114) // 1000
                    counts[lum >> 5] += 1
            hist = [c / (OW * OH) for c in counts]
            rec = ("false", str(OH), jarr(hist), str(media_id), str(h),
                   str(w), str(OW))
        except Exception:
            rec = ("true", "-1", "[]", str(media_id), "-1", "-1", "-1")
        lines.append(SEP.join(rec))
    return lines


def qb40(rows):
    """explodeFrames(videos, 4): PNG-signature scan, 4 evenly spaced whole
    frames, raw bytes. Columns sorted: frame_bytes(hex), frame_no, media_id."""
    lines = []
    for media_id, kind, _mime, content in rows:
        if kind != "video":
            continue
        starts = []
        i = 0
        while i <= len(content) - len(PNG_SIG):
            if content[i : i + len(PNG_SIG)] == PNG_SIG:
                starts.append(i)
                i += len(PNG_SIG)
            else:
                i += 1
        if not starts:
            continue
        bounds = starts + [len(content)]
        take = min(4, len(starts))
        for k in range(take):
            f = k * len(starts) // take
            frame = content[bounds[f] : bounds[f + 1]]
            lines.append(SEP.join((frame.hex().upper(), str(k), str(media_id))))
    return lines


def qb41(rows):
    """decodeAudios over syntheticAudio(120). Columns sorted: channels,
    decode_error, duration_ms, media_id, rms(json), sample_rate."""
    lines = []
    for media_id, _kind, _mime, content in rows:
        try:
            rate, nch, pcm = wav_samples(content)
            nframes = len(pcm) // (2 * nch)
            sumsq = [0] * nch
            for f in range(nframes):
                for c in range(nch):
                    s = s16(pcm, f * nch + c)
                    sumsq[c] += s * s
            rms = [
                0.0 if nframes == 0 else math.sqrt(float(sq) / nframes) / 32768.0
                for sq in sumsq
            ]
            dur = nframes * 1000 // rate
            rec = (str(nch), "false", str(dur), str(media_id), jarr(rms), str(rate))
        except Exception:
            rec = ("-1", "true", "-1", str(media_id), "[]", "-1")
        lines.append(SEP.join(rec))
    return lines


def qb42(rows):
    """decodeGifFrames(syntheticGifMedia(90), 3). Columns sorted:
    decode_error, frame_no, height, histogram, media_id, n_frames, width."""
    lines = []
    for media_id, _kind, _mime, content in rows:
        try:
            for f, total, w, h, hist in gif_sampled_histograms(content, 3):
                lines.append(SEP.join(("false", str(f), str(h), jarr(hist),
                                       str(media_id), str(total), str(w))))
        except Exception:
            lines.append(SEP.join(("true", "-1", "-1", "[]",
                                   str(media_id), "-1", "-1")))
    return lines


def qb43(rows, window_ms=20, freqs=(440.0, 1000.0, 2500.0)):
    """decodeAudioFrames(syntheticAudio(120), 20, [440,1000,2500]): windowed
    RMS + Goertzel, replicating the Scala evaluation order exactly. Columns
    sorted: band_amp(json), decode_error, frame_no, media_id, n_frames,
    rms(double), start_ms."""
    lines = []
    for media_id, _kind, _mime, content in rows:
        try:
            rate, nch, pcm = wav_samples(content)
            nframes = len(pcm) // (2 * nch)
            if nframes == 0:
                raise ValueError("empty audio stream")
            win = max(1, rate * window_ms // 1000)
            nwin = (nframes + win - 1) // win
            coeffs = [2.0 * math.cos(2.0 * math.pi * f / rate) for f in freqs]
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
                        acc += s16(pcm, i * nch + c)
                    x = acc / nch / 32768.0
                    sumsq += x * x
                    for k, coeff in enumerate(coeffs):
                        s0 = x + coeff * s1[k] - s2[k]
                        s2[k] = s1[k]
                        s1[k] = s0
                bands = [
                    math.sqrt(max(s1[k] * s1[k] + s2[k] * s2[k]
                                  - coeffs[k] * s1[k] * s2[k], 0.0)) * 2.0 / n
                    for k in range(len(coeffs))
                ]
                rms = math.sqrt(sumsq / n)
                lines.append(SEP.join((jarr(bands), "false", str(wi),
                                       str(media_id), str(nwin),
                                       jdouble(rms), str(lo * 1000 // rate))))
        except Exception:
            lines.append(SEP.join(("[]", "true", "-1", str(media_id), "-1",
                                   jdouble(-1.0), "-1")))
    return lines


def dhash_png(data: bytes) -> int:
    """64-bit dHash: 9x8 integer-floor luminance sample, bit = right>left,
    MSB-first row-major -- Multimodal.dHash's exact arithmetic."""
    w, h, rows = png_decode_first(data)
    lum = [[0] * 9 for _ in range(8)]
    for y in range(8):
        row = rows[y * h // 8]
        for x in range(9):
            sx = x * w // 9
            r, g, b = row[3 * sx], row[3 * sx + 1], row[3 * sx + 2]
            lum[y][x] = (r * 299 + g * 587 + b * 114) // 1000
    v = 0
    for y in range(8):
        for x in range(8):
            v = (v << 1) | (1 if lum[y][x + 1] > lum[y][x] else 0)
    return v


def qb45(rows):
    """imageNearDupPairs(syntheticNearDupMedia(100), 3): dHash every image,
    then BRUTE-FORCE all-pairs Hamming <= 3 -- independent of the Scala
    side's combination blocking, so this re-derivation also re-proves the
    blocking's exactness on this fixture. Columns sorted:
    hamming, id_a, id_b."""
    sigs = [(media_id, dhash_png(bytes(content)))
            for media_id, kind, mime, content in rows]
    lines = []
    for i in range(len(sigs)):
        for j in range(i + 1, len(sigs)):
            (ia, va), (ib, vb) = sigs[i], sigs[j]
            if ia > ib:
                (ia, va), (ib, vb) = (ib, vb), (ia, va)
            d = bin(va ^ vb).count("1")
            if d <= 3:
                lines.append(SEP.join((str(d), str(ia), str(ib))))
    return lines


AUDIO_BANDS = (400.0, 700.0, 1000.0, 1400.0, 1900.0, 2500.0, 3100.0, 3700.0)


def audio_dhash(data: bytes) -> int:
    """64-bit audio fingerprint: 8 equal time spans x 8 Goertzel bands,
    bit = band amplitude > the span's mean band amplitude, MSB-first
    row-major -- Multimodal.audioDHash's exact arithmetic (same strict
    left-to-right recurrence and mean fold)."""
    rate, nch, pcm = wav_samples(data)
    nframes = len(pcm) // (2 * nch)
    if nframes == 0:
        raise ValueError("empty audio stream")
    coeffs = [2.0 * math.cos(2.0 * math.pi * f / rate) for f in AUDIO_BANDS]
    h = 0
    for w in range(8):
        lo = w * nframes // 8
        hi = (w + 1) * nframes // 8
        n = hi - lo
        amps = [0.0] * 8
        if n > 0:
            s1 = [0.0] * 8
            s2 = [0.0] * 8
            for i in range(lo, hi):
                acc = 0.0
                for c in range(nch):
                    acc += s16(pcm, i * nch + c)
                x = acc / nch / 32768.0
                for k, coeff in enumerate(coeffs):
                    s0 = x + coeff * s1[k] - s2[k]
                    s2[k] = s1[k]
                    s1[k] = s0
            amps = [
                math.sqrt(max(s1[k] * s1[k] + s2[k] * s2[k]
                              - coeffs[k] * s1[k] * s2[k], 0.0)) * 2.0 / n
                for k in range(8)
            ]
        mean = 0.0
        for k in range(8):
            mean += amps[k]
        mean /= 8.0
        for k in range(8):
            h = (h << 1) | (1 if amps[k] > mean else 0)
    return h


def qb46(rows):
    """audioNearDupPairs(syntheticNearDupAudio(72), bands, 3): fingerprint
    every decodable WAV, then BRUTE-FORCE all-pairs Hamming <= 3 --
    independent of the Scala side's combination blocking (re-proving its
    exactness on this fixture); corrupt payloads are skipped, mirroring
    the decode_error isolation. Columns sorted: hamming, id_a, id_b."""
    sigs = []
    for media_id, _kind, _mime, content in rows:
        try:
            sigs.append((media_id, audio_dhash(bytes(content))))
        except Exception:
            pass
    lines = []
    for i in range(len(sigs)):
        for j in range(i + 1, len(sigs)):
            (ia, va), (ib, vb) = sigs[i], sigs[j]
            if ia > ib:
                (ia, va), (ib, vb) = (ib, vb), (ia, va)
            d = bin(va ^ vb).count("1")
            if d <= 3:
                lines.append(SEP.join((str(d), str(ia), str(ib))))
    return lines


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
        print(f"[media] fixture dump missing under {DUMP} ({e}); run\n"
              f"  sbt 'runMain graft.MediaDump {DUMP}'", file=sys.stderr)
        return 2

    lanes = {
        "qb39_media_decode": qb39(media),
        "qb40_media_frames": qb40(media[:60]),
        "qb41_audio_decode": qb41(audio),
        "qb42_gif_frames": qb42(gif),
        "qb43_audio_frames": qb43(audio),
        "qb44_media_resize": qb44(media),
        "qb45_image_neardup": qb45(neardup),
        "qb46_audio_neardup": qb46(audio_neardup),
    }
    bad = 0
    for name, lines in lanes.items():
        got = canon_md5(lines)
        ok = got == PINS[name]
        print(f"[media] {'OK  ' if ok else 'MISS'} {name}: {len(lines)} rows, "
              f"md5 {got}" + ("" if ok else f" != pinned {PINS[name]}"))
        bad += 0 if ok else 1
    if bad == 0:
        print("[media] all eight pins re-derived independently")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
