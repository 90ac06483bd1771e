"""loggen analogue: deterministic syslog load generator
(reference tests/loggen/ — logline_generator.c message shapes; the
transports are sockets there, a file or stdout here, which is the wire
this batch engine's file()/framed sources consume).

    python -m axosyslog_ray.loggen [options] OUTPUT|-

Options (the loggen surface that matters without sockets):
    --rate R          target msg/sec used to size the run (default 1000)
    --interval S      run length in seconds (default 10) -> N = R*S
    --number N        exact message count (overrides rate*interval)
    --size B          padded line size in bytes incl. newline (default 256)
    --syslog-proto    RFC5424 frame ("<38>1 ... - - \\xef\\xbb\\xbfseq: ...")
                      instead of RFC3164
    --sdata VALUE     SDATA block for --syslog-proto (default "-")
    --framing         RFC6587 octet-count prefix per line
    --csv             per-chunk "seconds,rate" time series on stderr

Prints the reference's closing summary shape:
    average rate = X msg/sec, count=N, time=T.TT
"""

from __future__ import annotations

import sys
import time

PADDING = "PADD"


def build_line(seq: int, run_id: int, now_str: str, size: int,
               syslog_proto: bool, sdata: str, framing: bool,
               thread_id: int = 0) -> str:
    """One loggen line, PADD-filled to `size` BYTES incl. newline
    (logline_generator.c prepare_log_line_template). The RFC5424 BOM is
    the real U+FEFF (3 UTF-8 bytes EF BB BF), so size accounting and
    the --framing octet count are byte-exact."""
    if syslog_proto:
        body = (f"<38>1 {now_str}+02:00 localhost prg{0:05d} 1234 - "
                f"{sdata} \ufeffseq: {seq:010d}, "
                f"thread: {thread_id:04d}, runid: {run_id:<10d}, "
                f"stamp: {now_str:<19s} ")
    else:
        body = (f"<38>{now_str} localhost prg{0:05d}[1234]: "
                f"seq: {seq:010d}, thread: {thread_id:04d}, "
                f"runid: {run_id:<10d}, stamp: {now_str:<19s} ")
    blen = len(body.encode("utf-8"))
    if blen > size - 1:
        raise ValueError(
            f"message length too small, the minimum is {blen + 1} bytes")
    pad_n = size - 1 - blen
    pad = (PADDING * (pad_n // len(PADDING) + 1))[:pad_n]
    line = body + pad + "\n"
    if framing:
        line = f"{size} " + line
    return line


def main(argv: list[str]) -> int:
    rate, interval, number, size = 1000, 10, None, 256
    syslog_proto = framing = csv = False
    sdata, out_path = "-", None
    args = list(argv)
    while args:
        a = args.pop(0)
        if a == "--rate" and args:
            rate = int(args.pop(0))
        elif a == "--interval" and args:
            interval = int(args.pop(0))
        elif a == "--number" and args:
            number = int(args.pop(0))
        elif a == "--size" and args:
            size = int(args.pop(0))
        elif a == "--sdata" and args:
            sdata = args.pop(0)
        elif a == "--syslog-proto":
            syslog_proto = True
        elif a == "--framing":
            framing = True
        elif a == "--csv":
            csv = True
        elif a.startswith("--"):
            print(__doc__)
            return 2
        else:
            out_path = a
    if out_path is None:
        print(__doc__)
        return 2
    n = number if number is not None else rate * interval
    run_id = int(time.time())
    now_str = time.strftime("%Y-%m-%dT%H:%M:%S")
    out = sys.stdout if out_path == "-" else open(out_path, "w")
    t0 = time.perf_counter()
    chunk = max(1, rate)
    written = 0
    try:
        while written < n:
            t_chunk = time.perf_counter()
            batch = min(chunk, n - written)
            out.writelines(
                build_line(written + i, run_id, now_str, size,
                           syslog_proto, sdata, framing)
                for i in range(batch))
            written += batch
            if csv:
                dt = max(time.perf_counter() - t_chunk, 1e-9)
                print(f"{time.perf_counter() - t0:.3f};{batch / dt:.2f}",
                      file=sys.stderr)
    finally:
        if out is not sys.stdout:
            out.close()
    elapsed = max(time.perf_counter() - t0, 1e-9)
    print(f"average rate = {written / elapsed:.2f} msg/sec, "
          f"count={written}, time={elapsed:.2f}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
