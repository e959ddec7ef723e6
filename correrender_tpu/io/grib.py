"""Native GRIB2 loader (and a minimal writer for round-trips/tests).

Replaces the reference's eccodes-backed loader
(src/Loaders/GribLoader.cpp) with a dependency-free decoder in the
spirit of the repo's other native format codecs (NetCDF3, Zarr,
NIfTI). Capability matches the reference's used subset:

* messages grouped into time steps by (dataDate, dataTime)
  (GribLoader.cpp:152-168), fields named by parameter short name
  (``shortName``, :165 — here from a (discipline, category, number)
  table with a systematic fallback), vertical levels from the level
  value (:182-194, isobaric levels sorted descending pressure so z
  ascends with altitude);
* grid definition template 3.0 (regular lat/lon incl. scan-order
  normalization); data representation templates 5.0 (simple packing:
  ``Y = (R + X·2^E) / 10^D``) and 5.2/5.3 (complex packing with
  optional 1st/2nd-order spatial differencing — the NCEP-standard
  encodings, g2clib-compatible field layout); optional bitmap
  (section 6) → NaN, constant fields (nbits = 0);
* lat/lon metadata for the world-map renderer.

Decoding is lazy per (field, time): ``open()`` only indexes message
byte ranges.
"""

from __future__ import annotations

import struct

import numpy as np

from correrender_tpu.io.base import VolumeLoader, register_loader

# (discipline, parameterCategory, parameterNumber) → WMO short name
# for the common meteorological fields (eccodes paramId table subset).
_SHORT_NAMES = {
    (0, 0, 0): "t",
    (0, 0, 6): "dpt",
    (0, 1, 0): "q",
    (0, 1, 1): "r",
    (0, 1, 52): "tp",
    (0, 2, 2): "u",
    (0, 2, 3): "v",
    (0, 2, 8): "w",
    (0, 2, 10): "vo",
    (0, 2, 12): "d",
    (0, 3, 0): "pres",
    (0, 3, 1): "msl",
    (0, 3, 4): "gh",
    (0, 3, 5): "z",
    (0, 6, 1): "tcc",
    (2, 0, 0): "lsm",
}


def _short_name(discipline: int, category: int, number: int) -> str:
    return _SHORT_NAMES.get(
        (discipline, category, number),
        f"p{discipline}.{category}.{number}",
    )


def _sint(raw: int, bits: int) -> int:
    """GRIB sign-magnitude integer (MSB is the sign bit)."""
    sign_bit = 1 << (bits - 1)
    if raw & sign_bit:
        return -(raw & (sign_bit - 1))
    return raw


_IO_CODEC: object = None
_IO_CODEC_TRIED = False


def _io_codec():
    """The native bit-unpack library (None off-toolchain)."""
    global _IO_CODEC, _IO_CODEC_TRIED
    if not _IO_CODEC_TRIED:
        from correrender_tpu.native import io_codec

        _IO_CODEC = io_codec()
        _IO_CODEC_TRIED = True
    return _IO_CODEC


def _unpack_bits_native(buf: np.ndarray, bit_offset: int, nbits: int,
                        count: int, codec) -> np.ndarray:
    import ctypes

    if bit_offset + nbits * count > buf.size * 8:
        raise ValueError("GRIB bit stream exhausted")
    out = np.empty(count, np.int64)
    codec.unpack_bits_u64(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        bit_offset, nbits, count,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out


def _unpack_bits(data: bytes, nbits: int, count: int) -> np.ndarray:
    """Unpack ``count`` big-endian ``nbits``-wide unsigned ints.

    Single-pass native loop when the toolchain is available (the
    byte-level hot path of both GRIB packings — the numpy route pays
    an 8x bit expansion plus a (count, nbits) matmul); numpy fallback
    otherwise.
    """
    if nbits == 0:
        return np.zeros(count, np.int64)
    if nbits > 57:
        # Native unpack_bits_u64's contract is nbits in [0, 57]; the
        # numpy route wraps int64 past 63. A message can advertise any
        # octet value — raise instead of decoding garbage (same guard
        # as the complex-packing group widths).
        raise ValueError(f"GRIB bit width {nbits} > 57 unsupported")
    codec = _io_codec()
    if codec is not None:
        return _unpack_bits_native(
            np.frombuffer(data, np.uint8), 0, nbits, count, codec
        )
    bits = np.unpackbits(np.frombuffer(data, np.uint8))
    bits = bits[: count * nbits].reshape(count, nbits).astype(np.int64)
    weights = 1 << np.arange(nbits - 1, -1, -1, dtype=np.int64)
    return bits @ weights


class _Message:
    __slots__ = (
        "discipline", "date", "time", "short_name", "level",
        "ni", "nj", "la1", "lo1", "la2", "lo2", "scan",
        "ref", "bin_scale", "dec_scale", "nbits", "npoints",
        "bitmap_span", "data_span", "drt", "cpx",
    )


class _BitReader:
    """Sequential big-endian bit reader with byte-boundary alignment
    (complex-packing header fields are each padded to whole octets).

    Uses the native single-pass unpacker when available; the numpy
    fallback pre-expands the buffer to one byte per bit."""

    def __init__(self, data: bytes):
        self._codec = _io_codec()
        if self._codec is None:
            self.bits = np.unpackbits(np.frombuffer(data, np.uint8))
        else:
            self.buf = np.frombuffer(data, np.uint8)
        self.pos = 0

    def read(self, nbits: int, count: int) -> np.ndarray:
        if nbits == 0:
            return np.zeros(count, np.int64)
        if nbits > 57:
            raise ValueError(
                f"GRIB bit width {nbits} > 57 unsupported"
            )
        total = nbits * count
        if self._codec is not None:
            out = _unpack_bits_native(
                self.buf, self.pos, nbits, count, self._codec
            )
            self.pos += total
            return out
        chunk = self.bits[self.pos:self.pos + total]
        self.pos += total
        vals = chunk.reshape(count, nbits).astype(np.int64)
        weights = 1 << np.arange(nbits - 1, -1, -1, dtype=np.int64)
        return vals @ weights

    def align(self):
        self.pos = (self.pos + 7) & ~7


def _parse_message(buf: bytes, start: int) -> tuple[list["_Message"], int]:
    """Parse one GRIB2 message → one field per (4..7) section group.

    GRIB2 permits repeated section sequences (3,)(4,5,6,7)(4,5,6,7)…
    inside a single message (common in NCEP products); a field is
    finalized at every section 7, inheriting the most recent sections
    1/3 state."""
    if buf[start:start + 4] != b"GRIB":
        raise ValueError("not a GRIB message")
    edition = buf[start + 7]
    if edition != 2:
        raise NotImplementedError(
            f"GRIB edition {edition} not supported (GRIB2 only)"
        )
    total_len = struct.unpack(">Q", buf[start + 8:start + 16])[0]
    end = start + total_len
    if buf[end - 4:end] != b"7777":
        raise ValueError("GRIB message missing 7777 terminator")

    out: list[_Message] = []
    msg = _Message()
    msg.discipline = buf[start + 6]
    msg.bitmap_span = None
    msg.data_span = None
    msg.drt = 0
    msg.cpx = None
    pos = start + 16
    while pos < end - 4:
        sec_len, sec_num = struct.unpack(">IB", buf[pos:pos + 5])
        body = buf[pos:pos + sec_len]
        if sec_num == 1:  # identification
            year, month, day, hour, minute = struct.unpack(
                ">HBBBB", body[12:18]
            )
            msg.date = year * 10000 + month * 100 + day
            msg.time = hour * 100 + minute
        elif sec_num == 3:  # grid definition
            template = struct.unpack(">H", body[12:14])[0]
            if template != 0:
                raise NotImplementedError(
                    f"grid definition template 3.{template} not "
                    "supported (regular lat/lon only)"
                )
            msg.ni = struct.unpack(">I", body[30:34])[0]
            msg.nj = struct.unpack(">I", body[34:38])[0]
            la1 = struct.unpack(">I", body[46:50])[0]
            lo1 = struct.unpack(">I", body[50:54])[0]
            la2 = struct.unpack(">I", body[55:59])[0]
            lo2 = struct.unpack(">I", body[59:63])[0]
            msg.la1 = _sint(la1, 32) / 1e6
            msg.lo1 = _sint(lo1, 32) / 1e6
            msg.la2 = _sint(la2, 32) / 1e6
            msg.lo2 = _sint(lo2, 32) / 1e6
            msg.scan = body[71]
        elif sec_num == 4:  # product definition
            category = body[9]
            number = body[10]
            msg.short_name = _short_name(
                msg.discipline, category, number
            )
            surface_type = body[22]
            scale = body[23]
            value = struct.unpack(">I", body[24:28])[0]
            lvl = float(_sint(value, 32)) / (10.0 ** _sint(scale, 8))
            if surface_type == 100:  # isobaric surface: Pa → hPa
                lvl /= 100.0
            msg.level = lvl
        elif sec_num == 5:  # data representation
            msg.npoints = struct.unpack(">I", body[5:9])[0]
            template = struct.unpack(">H", body[9:11])[0]
            if template not in (0, 2, 3):
                raise NotImplementedError(
                    f"data representation template 5.{template} not "
                    "supported (simple/complex[+diff] packing only)"
                )
            msg.drt = template
            msg.ref = struct.unpack(">f", body[11:15])[0]
            msg.bin_scale = _sint(
                struct.unpack(">H", body[15:17])[0], 16
            )
            msg.dec_scale = _sint(
                struct.unpack(">H", body[17:19])[0], 16
            )
            msg.nbits = body[19]
            if template in (2, 3):
                # Template 5.2/5.3 (complex packing [+ spatial
                # differencing]), octet numbering per WMO FM92.
                missing_mgmt = body[22]
                if missing_mgmt != 0:
                    raise NotImplementedError(
                        "complex packing with embedded missing-value "
                        f"management {missing_mgmt} not supported "
                        "(bitmaps are)"
                    )
                cpx = {
                    "ng": struct.unpack(">I", body[31:35])[0],
                    "width_ref": body[35],
                    "width_bits": body[36],
                    "len_ref": struct.unpack(">I", body[37:41])[0],
                    "len_inc": body[41],
                    "last_len": struct.unpack(">I", body[42:46])[0],
                    "len_bits": body[46],
                }
                if template == 3:
                    cpx["order"] = body[47]
                    cpx["extra_bytes"] = body[48]
                    if cpx["order"] not in (1, 2):
                        raise NotImplementedError(
                            f"spatial differencing order {cpx['order']}"
                        )
                msg.cpx = cpx
        elif sec_num == 6:  # bitmap
            indicator = body[5]
            if indicator == 0:
                msg.bitmap_span = (pos + 6, pos + sec_len)
            elif indicator != 255:
                raise NotImplementedError(
                    f"bitmap indicator {indicator} not supported"
                )
        elif sec_num == 7:  # data — closes one field's section group
            msg.data_span = (pos + 5, pos + sec_len)
            out.append(msg)
            prev = msg
            msg = _Message()
            for slot in _Message.__slots__:
                if hasattr(prev, slot):
                    setattr(msg, slot, getattr(prev, slot))
            msg.bitmap_span = None
            msg.data_span = None
        pos += sec_len
    return out, end


def _decode_complex(data: bytes, msg: "_Message") -> np.ndarray:
    """Data templates 7.2/7.3 (complex packing [+ spatial diff]).

    Field order per WMO FM92 / g2clib unpk_complex: [initial value(s)
    + overall minimum, template 7.3 only] → NG group references
    (nbits each) → NG group widths → NG scaled group lengths (each
    field padded to whole octets) → the groups' packed values,
    contiguous. Spatial differencing reconstructs with the g2clib
    recurrence (gmin added from index `order` on, initial values
    replacing the first `order` entries), vectorized as nested
    cumulative sums.
    """
    c = msg.cpx
    ng = c["ng"]
    br = _BitReader(data)
    if msg.drt == 3:
        nb = c["extra_bytes"] * 8
        raw = br.read(nb, c["order"] + 1)
        ivals = [_sint(int(v), nb) for v in raw[:-1]]
        gmin = _sint(int(raw[-1]), nb)
        br.align()
    refs = br.read(msg.nbits, ng)
    br.align()
    widths = c["width_ref"] + br.read(c["width_bits"], ng)
    br.align()
    lens = c["len_ref"] + c["len_inc"] * br.read(c["len_bits"], ng)
    br.align()
    if ng:
        lens[-1] = c["last_len"]
    total = int(lens.sum())
    x = np.empty(total, np.int64)
    if br._codec is not None and ng:
        # Group expansion stays native: ng ~ npoints/32 Python-level
        # reader calls otherwise.
        import ctypes

        need = int((widths * lens).sum())
        if br.pos + need > br.buf.size * 8:
            raise ValueError("GRIB bit stream exhausted")
        if int(widths.max(initial=0)) > 57:
            # unpack_bits_u64's accumulator contract; wider groups are
            # corrupt for physical fields anyway.
            raise ValueError(
                f"GRIB group width {int(widths.max())} > 57 bits "
                "(corrupt message?)"
            )
        i64p = ctypes.POINTER(ctypes.c_int64)
        refs_a = np.ascontiguousarray(refs, np.int64)
        widths_a = np.ascontiguousarray(widths, np.int64)
        lens_a = np.ascontiguousarray(lens, np.int64)
        br.pos += br._codec.unpack_groups_u64(
            br.buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            br.pos, refs_a.ctypes.data_as(i64p),
            widths_a.ctypes.data_as(i64p),
            lens_a.ctypes.data_as(i64p), ng,
            x.ctypes.data_as(i64p),
        )
    else:
        off = 0
        for g in range(ng):
            n = int(lens[g])
            x[off:off + n] = refs[g] + br.read(int(widths[g]), n)
            off += n
    if msg.drt == 3:
        order = c["order"]
        x[order:] += gmin
        if order == 1:
            x[0] = ivals[0]
            x = np.cumsum(x)
        else:
            x[0], x[1] = ivals[0], ivals[1]
            first = np.empty(total - 1, np.int64)
            first[0] = x[1] - x[0]
            first[1:] = x[2:]
            first = np.cumsum(first)  # f[i] − f[i−1]
            out = np.empty(total, np.int64)
            out[0] = x[0]
            out[1:] = x[0] + np.cumsum(first)
            x = out
    return x


def _decode_values(buf: bytes, msg: "_Message") -> np.ndarray:
    d0, d1 = msg.data_span
    if getattr(msg, "drt", 0) in (2, 3):
        x = _decode_complex(buf[d0:d1], msg)
    else:
        x = _unpack_bits(buf[d0:d1], msg.nbits, msg.npoints)
    y = (msg.ref + x.astype(np.float64) * 2.0 ** msg.bin_scale) \
        / 10.0 ** msg.dec_scale
    y = y.astype(np.float32)
    if msg.bitmap_span is not None:
        b0, b1 = msg.bitmap_span
        mask = np.unpackbits(
            np.frombuffer(buf[b0:b1], np.uint8)
        )[: msg.ni * msg.nj].astype(bool)
        full = np.full(msg.ni * msg.nj, np.nan, np.float32)
        full[mask] = y
        y = full
    grid = y.reshape(msg.nj, msg.ni)
    if msg.scan & 0x80:  # -i scan: east → west
        grid = grid[:, ::-1]
    if not (msg.scan & 0x40):  # first row is northernmost: flip so
        grid = grid[::-1]      # row index ascends with latitude
    return grid


@register_loader
class GribLoader(VolumeLoader):
    """Native GRIB2 reader (see module docstring for capability)."""

    extensions = ("grb", "grib", "grb2", "grib2")

    def open(self, path, dataset_info=None):
        import mmap

        self.path = path
        self._file = open(path, "rb")
        # Memory-map instead of read(): open() only indexes message
        # byte ranges, so multi-GB stores never materialize in RAM;
        # _decode_values slices the map lazily per field request.
        self._buf = mmap.mmap(
            self._file.fileno(), 0, access=mmap.ACCESS_READ
        )
        buf = self._buf
        messages = []
        pos = 0
        while True:
            idx = buf.find(b"GRIB", pos)
            if idx < 0:
                break
            msgs, pos = _parse_message(buf, idx)
            messages.extend(msgs)
        if not messages:
            raise ValueError(f"{path}: no GRIB2 messages found")

        # Catalog data_date/data_time select one analysis time
        # (GribLoader.cpp:152-165 skips other messages).
        want_date = getattr(dataset_info, "date", None)
        want_time = getattr(dataset_info, "data_time", None)
        if want_date is not None:
            filtered = [
                m for m in messages
                if m.date == int(want_date)
                and (want_time is None or m.time == int(want_time))
            ]
            if not filtered:
                raise ValueError(
                    f"{path}: no messages at data_date={want_date} "
                    f"data_time={want_time}"
                )
            messages = filtered

        times = sorted({(m.date, m.time) for m in messages})
        # Isobaric levels: descending pressure so z ascends with
        # altitude (matches the reference's level handling).
        levels = sorted({m.level for m in messages}, reverse=True)
        names = []
        for m in messages:
            if m.short_name not in names:
                names.append(m.short_name)

        self._index = {}
        for m in messages:
            key = (m.short_name, times.index((m.date, m.time)),
                   levels.index(m.level))
            self._index[key] = m

        m0 = messages[0]
        self.xs, self.ys, self.zs = m0.ni, m0.nj, len(levels)
        self.ts = len(times)
        self.es = 1
        self.field_names = names
        self.levels = levels
        self.time_steps = times
        la_lo, la_hi = sorted((m0.la1, m0.la2))
        lo_lo, lo_hi = sorted((m0.lo1, m0.lo2))
        self.lat = np.linspace(la_lo, la_hi, m0.nj).astype(np.float32)
        self.lon = np.linspace(lo_lo, lo_hi, m0.ni).astype(np.float32)
        return self

    def load_field(self, name, time=0, member=0):
        out = np.full((self.zs, self.ys, self.xs), np.nan, np.float32)
        for z in range(self.zs):
            msg = self._index.get((name, time, z))
            if msg is not None:
                out[z] = _decode_values(self._buf, msg)
        return out

    def close(self):
        if getattr(self, "_buf", None) is not None:
            self._buf.close()
            self._buf = None
        if getattr(self, "_file", None) is not None:
            self._file.close()
            self._file = None


def _pack_bits_concat(pieces) -> bytes:
    """Pack [(values, nbits), ...] fields, each padded to octets."""
    out = bytearray()
    for vals, nb in pieces:
        vals = np.asarray(vals, np.int64)
        if nb == 0 or len(vals) == 0:
            continue
        bits = (
            (vals[:, None] >> np.arange(nb - 1, -1, -1)) & 1
        ).astype(np.uint8).ravel()
        out += np.packbits(bits).tobytes()
    return bytes(out)


def _pack_bits_stream(pieces) -> bytes:
    """Pack [(values, nbits), ...] as ONE contiguous bit stream.

    Unlike :func:`_pack_bits_concat` no piece is octet-padded — only
    the final stream is. The group-values field of templates 7.2/7.3
    is specified (and decoded, see `_decode_complex`) this way: with a
    group length that is not a multiple of 8 per-group padding would
    shift every following group's bits.
    """
    chunks = []
    for vals, nb in pieces:
        vals = np.asarray(vals, np.int64)
        if nb == 0 or len(vals) == 0:
            continue
        chunks.append((
            (vals[:, None] >> np.arange(nb - 1, -1, -1)) & 1
        ).astype(np.uint8).ravel())
    if not chunks:
        return b""
    return np.packbits(np.concatenate(chunks)).tobytes()


def _encode_complex(x: np.ndarray, diff_order: int = 0,
                    group_len: int = 32):
    """Encode non-negative ints as template 5.2/5.3 payloads.

    Returns (sec5_tail: bytes from octet 22 on, sec7_payload, nbits).
    Fixed-length groups (last one short) keep the scaled-length field
    zero bits wide; spatial differencing uses 4-octet descriptors.
    """
    header = b""
    # Spatial differencing needs diff_order leading values to store as
    # initial values (and the recurrence to be meaningful): degenerate
    # grids (n ≤ diff_order) silently drop to a lower order — otherwise
    # the header would hold fewer ivals than section 5 advertises and
    # the decoder would read into the group references.
    diff_order = min(diff_order, max(len(x) - 1, 0))
    if diff_order:
        ivals = [int(v) for v in x[:diff_order]]
        d = x.astype(np.int64).copy()
        if diff_order == 1:
            d[1:] = np.diff(d)
        else:
            d2 = d[2:] - 2 * d[1:-1] + d[:-2]
            d = np.concatenate([d[:2], d2])
        gmin = int(d[diff_order:].min()) if len(d) > diff_order else 0
        d[diff_order:] -= gmin
        d[:diff_order] = 0
        x = d

        def sm32(v):
            return (1 << 31) | (-v) if v < 0 else v

        header = b"".join(
            struct.pack(">I", sm32(v)) for v in ivals + [gmin]
        )

    n = len(x)
    ng = max(-(-n // group_len), 1)
    groups = [x[g * group_len:(g + 1) * group_len] for g in range(ng)]
    refs = np.array([int(g.min()) if len(g) else 0 for g in groups],
                    np.int64)
    spans = [g - r for g, r in zip(groups, refs)]
    widths = np.array([
        int(s.max()).bit_length() if len(s) and s.max() > 0 else 0
        for s in spans
    ], np.int64)
    nbits_ref = max(int(refs.max()).bit_length(), 1) if refs.max() > 0 \
        else 1
    payload = header + _pack_bits_concat([(refs, nbits_ref)])
    payload += _pack_bits_concat([(widths, 8)])
    # lengths: all group_len (scaled field 0 bits); decoder overrides
    # the last group from last_len.
    data_bits = []
    for s, w in zip(spans, widths):
        if w:
            data_bits.append((s, int(w)))
    payload += _pack_bits_stream(data_bits)

    sec5_tail = (
        struct.pack(">BB", 1, 0)  # 22 splitting method, 23 missing mgmt
        + struct.pack(">II", 0, 0)  # 24..31 missing substitutes
        + struct.pack(">I", ng)  # 32..35
        + struct.pack(">BB", 0, 8)  # 36 width ref, 37 width bits
        + struct.pack(">IB", group_len, 1)  # 38..41 len ref, 42 inc
        + struct.pack(">IB", len(groups[-1]), 0)  # 43..46 last, 47 bits
    )
    if diff_order:
        sec5_tail += struct.pack(">BB", diff_order, 4)  # 48, 49
    return sec5_tail, payload, nbits_ref


def write_grib2(
    path: str,
    fields: dict,
    levels=None,
    date: int = 20200101,
    time: int = 0,
    lat=(-90.0, 90.0),
    lon=(0.0, 359.0),
    nbits: int = 16,
    packing: str = "simple",
    group_len: int = 32,
):
    """Minimal GRIB2 writer (grid template 3.0; data representation
    5.0 simple packing, or 5.2/5.3 complex packing via ``packing`` in
    {"simple", "complex", "complex_diff1", "complex_diff2"} — the
    NCEP-style encodings the loader also decodes).

    Args:
      fields: ``{short_name: (L, Nj, Ni) array}``.
      levels: per-z level values in hPa (default 1000, 900, ...).

    One message per (field, level). Exists for round-trip tests and
    as a field-export target; inverse of :class:`GribLoader`.
    """
    name_to_code = {v: k for k, v in _SHORT_NAMES.items()}
    out = bytearray()
    first = next(iter(fields.values()))
    nz, nj, ni = first.shape
    if levels is None:
        levels = [1000.0 - 100.0 * z for z in range(nz)]

    # Unknown field names get DISTINCT local-use parameter numbers
    # (192+i in category 254): one shared fallback code made every
    # custom-named field decode as the same short_name, and the
    # loader's (name, time, level) index silently kept only the last
    # (round-3 review).
    n_custom = 0
    for name, vol in fields.items():
        code = name_to_code.get(name)
        if code is None:
            # The local-use parameter range is ONE octet, 192..254 —
            # 63 slots. Unbounded 192+i hit 255 (the GRIB2 "missing"
            # sentinel) at the 64th custom field and overflowed the
            # octet past that (struct.error mid-file); spill into
            # additional local-use categories instead (round-3
            # review). 63 categories × 63 numbers = 3969 fields.
            if n_custom >= 63 * 63:
                raise ValueError(
                    "write_grib2: more than 3969 custom-named fields "
                    "— out of GRIB2 local-use parameter codes"
                )
            code = (0, 254 - n_custom // 63, 192 + n_custom % 63)
            n_custom += 1
        disc, cat, num = code
        for z in range(nz):
            grid = np.asarray(vol[z], np.float64)
            # NaN voxels (loader _FillValue slabs) are encoded through
            # a section-6 bitmap — quantizing them silently round-
            # tripped as the field minimum (round-3 review finding).
            valid = np.isfinite(grid).ravel()
            has_bitmap = not valid.all()
            vals = grid.ravel()[valid]
            lo = float(vals.min()) if vals.size else 0.0
            hi = float(vals.max()) if vals.size else 0.0
            span = max(hi - lo, 0.0)
            sec5_tail = b""
            drt = {"simple": 0, "complex": 2,
                   "complex_diff1": 3, "complex_diff2": 3}[packing]
            diff_order = {"simple": 0, "complex": 0,
                          "complex_diff1": 1, "complex_diff2": 2}[packing]
            if span == 0.0 or nbits == 0:
                nb, scale = 0, 0
                packed = b""
                drt = 0
            else:
                nb = nbits
                # binary scale s.t. (hi-lo) fits in nbits.
                scale = int(np.ceil(np.log2(span / (2**nb - 1))))
                x = np.round(
                    (vals - lo) / 2.0 ** scale
                ).astype(np.int64)
                x = np.clip(x, 0, 2**nb - 1)
                if drt == 0:
                    bits = (
                        (x[:, None] >> np.arange(nb - 1, -1, -1)) & 1
                    ).astype(np.uint8).ravel()
                    packed = np.packbits(bits).tobytes()
                else:
                    # Keep the template number consistent with the
                    # encoder's degenerate-grid order clamp (n ≤ order
                    # drops to a lower/no differencing).
                    diff_order = min(diff_order, max(x.size - 1, 0))
                    drt = 3 if diff_order else 2
                    sec5_tail, packed, nb = _encode_complex(
                        x, diff_order, group_len
                    )

            def sec(num_, body):
                return struct.pack(">IB", len(body) + 5, num_) + body

            def usint(v, bits):
                """Encode a sign-magnitude GRIB integer."""
                v = int(round(v))
                if v < 0:
                    return (1 << (bits - 1)) | (-v)
                return v

            # Section 1 — identification (octets 6..21).
            s1 = sec(1, struct.pack(
                ">HHBBBHBBBBBBB",
                0, 0, 2, 1, 1,  # centre, subcentre, tables, ref-time
                date // 10000, (date // 100) % 100, date % 100,
                time // 100, time % 100, 0, 0, 1,
            ))
            # Section 3 — grid definition template 3.0 (octets 6..72).
            s3 = sec(3, (
                struct.pack(">BIBBH", 0, ni * nj, 0, 0, 0)  # 6..14
                + struct.pack(">BBIBIBI", 6, 0, 0, 0, 0, 0, 0)  # 15..30
                + struct.pack(">II", ni, nj)  # 31..38
                + struct.pack(">II", 0, 0)  # 39..46 basic angle
                + struct.pack(">II", usint(lat[0] * 1e6, 32),
                              usint(lon[0] * 1e6, 32))  # 47..54
                + struct.pack(">B", 0x30)  # 55 resolution flags
                + struct.pack(">II", usint(lat[1] * 1e6, 32),
                              usint(lon[1] * 1e6, 32))  # 56..63
                + struct.pack(
                    ">II",
                    int(abs(lon[1] - lon[0]) / max(ni - 1, 1) * 1e6),
                    int(abs(lat[1] - lat[0]) / max(nj - 1, 1) * 1e6),
                )  # 64..71 Di, Dj
                + struct.pack(">B", 0x40)  # 72 scan: +i, +j (S → N)
            ))
            # Section 4 — product definition template 4.0 (octets 6..34).
            s4 = sec(4, (
                struct.pack(">HH", 0, 0)  # 6..9 coords, template
                + struct.pack(">BBBBB", cat, num, 0, 0, 0)  # 10..14
                + struct.pack(">HBB", 0, 0, 1)  # 15..18 cutoff, unit
                + struct.pack(">I", 0)  # 19..22 forecast time
                + struct.pack(">BBI", 100, 0,
                              usint(levels[z] * 100, 32))  # 23..28
                + struct.pack(">BBI", 255, 0, 0)  # 29..34 2nd surface
            ))
            # Section 5 — data representation template 5.0/5.2/5.3.
            # npoints = number of encoded VALUES (valid points only
            # when a bitmap is present, FM92 section 5 octets 6-9).
            s5 = sec(5, struct.pack(
                ">IHfHHBB",
                int(valid.sum()), drt, np.float32(lo),
                usint(scale, 16), 0, nb, 0,
            ) + sec5_tail)
            if has_bitmap:
                s6 = sec(6, struct.pack(">B", 0)
                         + np.packbits(valid.astype(np.uint8)).tobytes())
            else:
                s6 = sec(6, struct.pack(">B", 255))
            s7 = sec(7, packed)
            body = s1 + s3 + s4 + s5 + s6 + s7
            total = 16 + len(body) + 4
            out += (
                b"GRIB" + struct.pack(">HBB", 0, disc, 2)
                + struct.pack(">Q", total) + body + b"7777"
            )
    with open(path, "wb") as f:
        f.write(bytes(out))
