"""Linux process-accounting (pacct) v3 record parser.

Reference: modules/pacctformat/pacct-format.c (pacct_format_handler,
PACCT_CONVERT_COMP_TO_ULONG) — fixed 64-byte `struct acct_v3` records
(public linux/acct.h layout) decoded into `.pacct.*` name-values with
the reference's exact printf renderings:

- ac_flag  "%02x"; ac_tty/ac_exitcode/ac_uid/ac_gid/ac_pid/ac_ppid "%u"
- comp_t fields decode (x & 0x1fff) << (((x >> 13) & 7) * 3):
  ac_utime/ac_stime/ac_btime as "%lu.00" (the reference applies the
  comp decode to ac_btime too — pacct-format.c:145 — quirk preserved),
  ac_mem/ac_io/ac_rw/ac_minflt/ac_majflt/ac_swaps as "%lu"
- ac_etime float as "%9.2f" (width-9 space padding preserved)
- ac_comm: strlen() up to the first NUL when the last byte is NUL,
  otherwise all 16 raw bytes (pacct-format.c:155-159)
- MSGFORMAT = "linux:pacct"; undersized tail records and non-v3
  versions produce the reference's error text in $MESSAGE

Ray-native shape: the whole record stream is ONE np.frombuffer over a
little-endian structured dtype — every field then renders as a
vectorized kernel (np.char.mod / integer ops); no per-record Python
except the comm NUL-split on the (rare) trailing-garbage rows. A
pacct file maps to batches with `read_pacct`, which shards by FILE via
read_binary_files (accounting files rotate small; chunk upstream if
one file ever grows past a block)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

ACCT_COMM = 16
RECORD_SIZE = 64

_ACCT_V3 = np.dtype([
    ("ac_flag", "u1"), ("ac_version", "u1"), ("ac_tty", "<u2"),
    ("ac_exitcode", "<u4"), ("ac_uid", "<u4"), ("ac_gid", "<u4"),
    ("ac_pid", "<u4"), ("ac_ppid", "<u4"), ("ac_btime", "<u4"),
    ("ac_etime", "<f4"), ("ac_utime", "<u2"), ("ac_stime", "<u2"),
    ("ac_mem", "<u2"), ("ac_io", "<u2"), ("ac_rw", "<u2"),
    ("ac_minflt", "<u2"), ("ac_majflt", "<u2"), ("ac_swaps", "<u2"),
    ("ac_comm", "S16"),
])
assert _ACCT_V3.itemsize == RECORD_SIZE

COMP_FIELDS_00 = ("ac_btime", "ac_utime", "ac_stime")   # "%lu.00"
COMP_FIELDS = ("ac_mem", "ac_io", "ac_rw", "ac_minflt", "ac_majflt",
               "ac_swaps")                               # "%lu"
UINT_FIELDS = ("ac_tty", "ac_exitcode", "ac_uid", "ac_gid", "ac_pid",
               "ac_ppid")                                # "%u"


def comp_to_ulong(x: np.ndarray) -> np.ndarray:
    """PACCT_CONVERT_COMP_TO_ULONG: 13-bit mantissa, base-8 exponent."""
    x = x.astype(np.uint64)
    return (x & np.uint64(0x1FFF)) << (((x >> np.uint64(13)) & np.uint64(7))
                                       * np.uint64(3))


def _comm_strings(raw: np.ndarray) -> np.ndarray:
    """ac_comm render: strlen up to first NUL iff byte[15] is NUL, else
    the full 16 raw bytes (numpy S16 strips trailing NULs, so re-pad the
    keep-all-16 rows)."""
    out = np.empty(len(raw), dtype=object)
    for i, b in enumerate(raw):          # rare-row loop only in the
        full = b + b"\x00" * (ACCT_COMM - len(b))  # trailing-garbage case
        if full[ACCT_COMM - 1] == 0:
            out[i] = full.split(b"\x00", 1)[0].decode("latin-1")
        else:
            out[i] = full.decode("latin-1")
    return out


def parse_pacct_records(data: bytes) -> pa.Table:
    """Decode a byte buffer of acct_v3 records into one Arrow table of
    `.pacct.*` string columns (+ `message` for malformed records)."""
    n_full = len(data) // RECORD_SIZE
    rec = np.frombuffer(data[:n_full * RECORD_SIZE], dtype=_ACCT_V3)
    cols: dict[str, np.ndarray] = {}
    v3 = rec["ac_version"] == 3

    cols[".pacct.ac_flag"] = np.char.mod("%02x", rec["ac_flag"])
    for f in UINT_FIELDS:
        cols[f".pacct.{f}"] = np.char.mod("%u", rec[f])
    for f in COMP_FIELDS_00:
        cols[f".pacct.{f}"] = np.char.mod("%d.00", comp_to_ulong(rec[f]))
    cols[".pacct.ac_etime"] = np.char.mod(
        "%9.2f", rec["ac_etime"].astype(np.float64))
    for f in COMP_FIELDS:
        cols[f".pacct.{f}"] = np.char.mod("%d", comp_to_ulong(rec[f]))
    cols[".pacct.ac_comm"] = _comm_strings(rec["ac_comm"])

    msg = np.full(n_full, "", dtype=object)
    bad = ~v3
    if bad.any():
        vers = rec["ac_version"][bad]
        msg[bad] = [("Error parsing process accounting record, only the "
                     f"v3 format is supported; version='{int(v)}'")
                    for v in vers]
        for k in cols:
            cols[k] = np.where(bad, "", cols[k])

    table_cols = {k: pa.array(np.asarray(v, dtype=object), type=pa.string())
                  for k, v in cols.items()}
    table_cols["message"] = pa.array(msg, type=pa.string())
    table_cols["msgformat"] = pa.array(
        np.where(v3, "linux:pacct", "").astype(object), type=pa.string())
    t = pa.table(table_cols)

    tail = len(data) - n_full * RECORD_SIZE
    if tail:
        err = ("Error parsing process accounting record, record too "
               f"small; rec_size='{tail}', expected_size='{RECORD_SIZE}'")
        pad = {c: pa.array([""], type=pa.string()) for c in t.column_names}
        pad["message"] = pa.array([err], type=pa.string())
        t = pa.concat_tables([t, pa.table(pad)])
    return t


def read_pacct(paths):
    """Ray Data source: pacct file(s) -> Dataset of `.pacct.*` rows.
    One read task per file (read_binary_files), vectorized decode per
    file buffer — embarrassingly parallel, no shuffle."""
    import ray.data as rd

    ds = rd.read_binary_files(paths)
    return ds.map_batches(
        lambda b: pa.concat_tables(
            [parse_pacct_records(d.as_py() if hasattr(d, "as_py") else d)
             for d in b.column("bytes")])
        if b.num_rows else parse_pacct_records(b""),
        batch_format="pyarrow")


def make_pacct_record(ac_flag=0, ac_version=3, ac_tty=0, ac_exitcode=0,
                      ac_uid=0, ac_gid=0, ac_pid=0, ac_ppid=0, ac_btime=0,
                      ac_etime=0.0, ac_utime=0, ac_stime=0, ac_mem=0,
                      ac_io=0, ac_rw=0, ac_minflt=0, ac_majflt=0,
                      ac_swaps=0, ac_comm=b"") -> bytes:
    """Test/fixture encoder for one acct_v3 record."""
    rec = np.zeros(1, dtype=_ACCT_V3)
    for k, v in locals().items():
        if k == "rec":
            continue
        if k == "ac_comm":
            rec["ac_comm"] = v
        else:
            rec[k] = v
    return rec.tobytes()
