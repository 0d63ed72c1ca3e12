"""XDF (Extensible Data Format) importer — fresh implementation from the
public XDF specification (https://github.com/sccn/xdf/wiki/Specifications).

Replaces the reference's vendored pyxdf 1.15 (``local/xdf.py``, noted in its
README).  Returns the same access shape the loaders rely on
(``local/data_loader.py:39-110``): a list of stream dicts with
``info['name'][0]``, ``info['type'][0]``, ``info['nominal_srate'][0]``,
``info['created_at'][0]``, ``info['desc'][0]['channels'][0]['channel']``,
``time_series`` (ndarray or list-of-lists for string streams) and
``time_stamps``.

Includes clock synchronization from ClockOffset chunks (linear fit of offset
vs. time, falling back to the median for short recordings) and optional
timestamp de-jittering (per-segment linear fit of timestamp vs. sample index
for regular-rate streams).

Chunk layout: [1-byte length-of-length][length LE][uint16 tag][content]:
tag 1 FileHeader (XML), 2 StreamHeader (uint32 id + XML), 3 Samples,
4 ClockOffset (id + 2 doubles), 5 Boundary (16-byte UUID), 6 StreamFooter.
Sample chunks: id, varlen sample count, then per sample a timestamp-bytes
flag (8 -> double present, 0 -> deduced) and channel values.
"""

from __future__ import annotations

import ctypes
import logging
import os
import struct
import xml.etree.ElementTree as ET
from collections import defaultdict

import numpy as np

logger = logging.getLogger("io.xdf")

_NATIVE_SENTINEL = object()
_native_lib_cache = _NATIVE_SENTINEL


def _native_scanner():
    """ctypes handle to native/libxdfscan.so (the sample-chunk hot loop at
    memory bandwidth for multi-GB recordings), or None."""
    global _native_lib_cache
    if _native_lib_cache is not _NATIVE_SENTINEL:
        return _native_lib_cache
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native", "libxdfscan.so")
    try:
        lib = ctypes.CDLL(path)
        lib.xdf_scan_samples.restype = ctypes.c_long
        lib.xdf_scan_samples.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint32, ctypes.c_uint64,
            ctypes.c_double, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long]
        _native_lib_cache = lib
    except OSError as e:
        logger.info("native XDF scanner unavailable (%s); pure-Python parse", e)
        _native_lib_cache = None
    return _native_lib_cache


def _native_scan_stream(data: bytes, st: "_Stream"):
    """All of one numeric stream's samples via the native scanner:
    (timestamps (n,), values (n, C)) or None when the lib is missing."""
    lib = _native_scanner()
    if lib is None:
        return None
    np_dtype, itemsize = _DTYPES[st.fmt]
    row_bytes = st.n_channels * itemsize
    n = lib.xdf_scan_samples(data, len(data), st.stream_id, row_bytes,
                             st.tdelta, None, None, 0)
    if n < 0:
        raise ValueError("malformed XDF sample chunks (native scan)")
    values = np.empty(n * row_bytes, np.uint8)
    ts = np.empty(n, np.float64)
    n2 = lib.xdf_scan_samples(data, len(data), st.stream_id, row_bytes,
                              st.tdelta,
                              values.ctypes.data_as(ctypes.c_void_p),
                              ts.ctypes.data_as(ctypes.c_void_p), n)
    assert n2 == n, (n2, n)
    return ts, values.view(np_dtype).reshape(n, st.n_channels)

_DTYPES = {
    "float32": ("<f4", 4),
    "double64": ("<f8", 8),
    "int8": ("<i1", 1),
    "int16": ("<i2", 2),
    "int32": ("<i4", 4),
    "int64": ("<i8", 8),
}


def _xml_to_dict(elem):
    """ElementTree element -> pyxdf-style nested dict-of-lists."""
    out = defaultdict(list)
    for child in elem:
        if len(child):
            out[child.tag].append(_xml_to_dict(child))
        else:
            out[child.tag].append(child.text)
    return dict(out)


def _read_varlen(buf, pos):
    nbytes = buf[pos]
    pos += 1
    if nbytes == 1:
        return buf[pos], pos + 1
    if nbytes == 4:
        return struct.unpack_from("<I", buf, pos)[0], pos + 4
    if nbytes == 8:
        return struct.unpack_from("<Q", buf, pos)[0], pos + 8
    raise ValueError(f"invalid varlen size descriptor {nbytes}")


class _Stream:
    def __init__(self, stream_id, header_xml):
        self.stream_id = stream_id
        root = ET.fromstring(header_xml)
        self.info = _xml_to_dict(root)
        self.n_channels = int(self.info["channel_count"][0])
        self.srate = float(self.info["nominal_srate"][0] or 0.0)
        self.fmt = self.info["channel_format"][0]
        self.chunks = []        # list of (timestamps ndarray, values)
        self.clock_times = []
        self.clock_values = []
        self.last_ts = 0.0

    @property
    def tdelta(self):
        return 1.0 / self.srate if self.srate > 0 else 0.0


def _parse_samples(buf, stream: _Stream):
    pos = 0
    n, pos = _read_varlen(buf, pos)
    C = stream.n_channels
    ts = np.empty(n, np.float64)
    if stream.fmt == "string":
        values = []
        for i in range(n):
            tsb = buf[pos]
            pos += 1
            if tsb == 8:
                t = struct.unpack_from("<d", buf, pos)[0]
                pos += 8
            else:
                t = stream.last_ts + stream.tdelta
            stream.last_ts = t
            ts[i] = t
            row = []
            for _ in range(C):
                ln, pos = _read_varlen(buf, pos)
                row.append(buf[pos : pos + ln].decode("utf-8", "replace"))
                pos += ln
            values.append(row)
        return ts, values

    np_dtype, itemsize = _DTYPES[stream.fmt]
    row_bytes = C * itemsize
    values = np.empty((n, C), dtype=np_dtype)
    i = 0
    while i < n:
        tsb = buf[pos]
        pos += 1
        if tsb == 8:
            t = struct.unpack_from("<d", buf, pos)[0]
            pos += 8
        else:
            t = stream.last_ts + stream.tdelta
        stream.last_ts = t
        ts[i] = t
        # fast path: run of samples without explicit timestamps
        j = i + 1
        run_start = pos + row_bytes
        while j < n and run_start < len(buf) and buf[run_start] == 0:
            run_start += 1 + row_bytes
            j += 1
        count = j - i
        end = pos + row_bytes
        values[i] = np.frombuffer(buf, np_dtype, C, pos)
        if count > 1:
            block = np.frombuffer(buf, np.uint8, (count - 1) * (1 + row_bytes), end)
            block = block.reshape(count - 1, 1 + row_bytes)[:, 1:].copy()
            values[i + 1 : j] = block.view(np_dtype).reshape(count - 1, C)
            ts[i + 1 : j] = t + stream.tdelta * np.arange(1, count)
            stream.last_ts = ts[j - 1]
            pos = end + (count - 1) * (1 + row_bytes)
        else:
            pos = end
        i = j
    return ts, values


def _detect_clock_resets(ct: np.ndarray, cv: np.ndarray,
                         time_stds=5.0, time_seconds=5.0,
                         value_stds=10.0, value_seconds=1.0):
    """Segment the clock-offset series at resets (computer restart /
    hot-swap mid-recording, reference ``local/xdf.py:439-497``).

    A reset is a point where BOTH the measurement times glitch (go backwards,
    or jump by more than ``time_stds`` MADs AND ``time_seconds``) and the
    offset values glitch (same criteria with the value thresholds).  Returns
    a list of (start, end) index ranges into ct/cv, end inclusive.
    """
    if len(ct) < 2:
        return [(0, len(ct) - 1)]
    dt = np.diff(ct)
    dv = np.abs(np.diff(cv))
    med_dt, med_dv = np.median(dt), np.median(dv)
    mad_t = np.median(np.abs(dt - med_dt)) + np.finfo(float).eps
    mad_v = np.median(np.abs(dv - med_dv)) + np.finfo(float).eps
    time_glitch = (dt < 0) | (((dt - med_dt) / mad_t > time_stds)
                              & (dt - med_dt > time_seconds))
    value_glitch = (np.diff(cv) < 0) | (((dv - med_dv) / mad_v > value_stds)
                                        & (dv - med_dv > value_seconds))
    resets = np.where(time_glitch & value_glitch)[0]
    if resets.size == 0:
        return [(0, len(ct) - 1)]
    bounds = np.concatenate([[0], resets + 1, [len(ct)]])
    return [(int(bounds[i]), int(bounds[i + 1] - 1)) for i in range(len(bounds) - 1)]


def _fit_offset(ct: np.ndarray, cv: np.ndarray):
    """Trimmed least squares offset(t) = a + b*(t - ct[0]); robust enough for
    the monotone drift LSL clock offsets exhibit.  Returns (a, b, t0)."""
    if len(ct) < 2 or np.ptp(ct) == 0:
        return float(np.median(cv)), 0.0, float(ct[0]) if len(ct) else 0.0
    A = np.stack([np.ones_like(ct), ct - ct[0]], axis=1)
    coef, *_ = np.linalg.lstsq(A, cv, rcond=None)
    resid = np.abs(A @ coef - cv)
    keep = resid <= np.quantile(resid, 0.8)
    if keep.sum() >= 2:
        coef, *_ = np.linalg.lstsq(A[keep], cv[keep], rcond=None)
    return float(coef[0]), float(coef[1]), float(ct[0])


def _apply_clock_sync(stream: _Stream, ts: np.ndarray,
                      handle_clock_resets=True) -> np.ndarray:
    if not stream.clock_times or ts.size == 0:
        return ts
    ct = np.asarray(stream.clock_times)
    cv = np.asarray(stream.clock_values)
    ranges = (_detect_clock_resets(ct, cv) if handle_clock_resets
              else [(0, len(ct) - 1)])
    if len(ranges) == 1:
        a, b, t0 = _fit_offset(ct, cv)
        return ts + a + b * (ts - t0)
    # A reset restarts the source clock, so sample timestamps jump backwards
    # at the same recording instant the offset series does.  Split the
    # samples at their own backwards jumps (file order == recording order)
    # and pair sample segments with clock segments chronologically; on a
    # count mismatch fall back to nearest-interval assignment.
    fits = [_fit_offset(ct[s : e + 1], cv[s : e + 1]) for s, e in ranges]
    jumps = np.where(np.diff(ts) < -1.0)[0] + 1
    sample_segs = np.split(np.arange(len(ts)), jumps)
    out = ts.copy()
    if len(sample_segs) == len(ranges):
        for seg, (a, b, t0) in zip(sample_segs, fits):
            out[seg] = ts[seg] + a + b * (ts[seg] - t0)
        return out
    spans = [(ct[s], ct[e]) for s, e in ranges]
    for seg in sample_segs:
        mid = float(np.median(ts[seg]))
        dists = [max(lo - mid, 0.0, mid - hi) for lo, hi in spans]
        a, b, t0 = fits[int(np.argmin(dists))]
        out[seg] = ts[seg] + a + b * (ts[seg] - t0)
    return out


def _dejitter(ts: np.ndarray, srate: float) -> np.ndarray:
    if srate <= 0 or len(ts) < 2:
        return ts
    # split at gaps > 1 s or 500 sample intervals (spec recommendation) and
    # at backwards jumps (clock resets must not be smeared by the fit)
    d = np.diff(ts)
    gaps = np.where((d > max(1.0, 500 * (1.0 / srate))) | (d < 0))[0] + 1
    out = ts.copy()
    for seg in np.split(np.arange(len(ts)), gaps):
        if len(seg) < 2:
            continue
        idx = seg - seg[0]
        A = np.stack([np.ones(len(seg)), idx], axis=1)
        coef, *_ = np.linalg.lstsq(A, ts[seg], rcond=None)
        out[seg] = A @ coef
    return out


def load_xdf(filename, synchronize_clocks=True, dejitter_timestamps=True,
             handle_clock_resets=True, use_native=True):
    """Parse an XDF (or gzipped .xdfz) file.

    Returns (streams, fileheader) like pyxdf.  ``handle_clock_resets``
    segments the clock-offset series at computer restarts / hot-swaps and
    fits offsets per segment (reference ``local/xdf.py:439-526``)."""
    with open(filename, "rb") as f:
        data = f.read()
    if data[:2] == b"\x1f\x8b":  # gzip magic: .xdfz container
        import gzip

        data = gzip.decompress(data)
    if data[:4] != b"XDF:":
        raise ValueError(f"{filename} is not an XDF file")
    pos = 4
    fileheader = None
    streams: dict[int, _Stream] = {}

    while pos < len(data):
        length, pos = _read_varlen(data, pos)
        tag = struct.unpack_from("<H", data, pos)[0]
        content = data[pos + 2 : pos + length]
        pos += length
        if tag == 1:
            fileheader = _xml_to_dict(ET.fromstring(content.decode("utf-8", "replace")))
        elif tag == 2:
            sid = struct.unpack_from("<I", content, 0)[0]
            streams[sid] = _Stream(sid, content[4:].decode("utf-8", "replace"))
        elif tag == 3:
            sid = struct.unpack_from("<I", content, 0)[0]
            st = streams[sid]
            if use_native and st.fmt != "string" and _native_scanner() is not None:
                st.native = True  # bulk-scanned after the header walk
            else:
                st.chunks.append(_parse_samples(content[4:], st))
        elif tag == 4:
            sid = struct.unpack_from("<I", content, 0)[0]
            t, v = struct.unpack_from("<dd", content, 4)
            if sid in streams:
                streams[sid].clock_times.append(t)
                streams[sid].clock_values.append(v)
        elif tag == 6:
            sid = struct.unpack_from("<I", content, 0)[0]
            if sid in streams:
                streams[sid].info.setdefault("footer", []).append(
                    _xml_to_dict(ET.fromstring(content[4:].decode("utf-8", "replace")))
                )
        # tag 5 (boundary) and unknown tags: skip

    out = []
    for st in streams.values():
        if getattr(st, "native", False):
            ts, series = _native_scan_stream(data, st)
        elif st.chunks:
            ts = np.concatenate([c[0] for c in st.chunks])
            if st.fmt == "string":
                series = [row for c in st.chunks for row in c[1]]
            else:
                series = np.concatenate([c[1] for c in st.chunks], axis=0)
        else:
            ts = np.zeros(0)
            series = [] if st.fmt == "string" else np.zeros((0, st.n_channels))
        if dejitter_timestamps:
            ts = _dejitter(ts, st.srate)
        if synchronize_clocks:
            ts = _apply_clock_sync(st, ts, handle_clock_resets)
        stream_dict = dict(st.info)
        out.append({"info": stream_dict, "time_series": series, "time_stamps": ts})
    return out, fileheader
