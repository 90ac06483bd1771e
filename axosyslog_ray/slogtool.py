"""Secure-logging CLI: the slogkey / slogencrypt / slogverify binaries
(reference modules/secure-logging/{slogkey,slogencrypt,slogverify})
over the engine's from-spec slog primitives (functions/slog.py).

    python -m axosyslog_ray.slogtool key-gen KEYFILE
    python -m axosyslog_ray.slogtool derive-key MASTERKEY MAC SERIAL HOSTKEY
    python -m axosyslog_ray.slogtool counter-show KEYFILE
    python -m axosyslog_ray.slogtool encrypt KEYFILE MACFILE INPUT OUTPUT
    python -m axosyslog_ray.slogtool verify KEYFILE MACFILE INPUT OUTPUT
        [--key-index N]

encrypt consumes the CURRENT key file (host key at its stored counter),
appends one encrypted line per input line to OUTPUT and persists the
evolved key + aggregated MAC — slogencrypt's resume contract. verify
decrypts INPUT with the key at --key-index (0 for a fresh archive),
checks the counter sequence and the MAC chain against MACFILE, and
writes the recovered plaintext to OUTPUT (slogverify normal mode)."""

from __future__ import annotations

import sys

from .functions.slog import (SlogWriter, derive_host_key,
                             generate_master_key, read_key, read_mac,
                             verify_entries, write_key)


def main(argv: list[str]) -> int:
    if not argv:
        print(__doc__)
        return 2
    cmd, args = argv[0], argv[1:]
    if cmd == "key-gen" and len(args) == 1:
        write_key(args[0], generate_master_key(), 0)
        print(f"master key written to {args[0]}")
        return 0
    if cmd == "derive-key" and len(args) == 4:
        master, _ = read_key(args[0])
        host = derive_host_key(master, args[1], args[2])
        write_key(args[3], host, 0)
        print(f"host key written to {args[3]}")
        return 0
    if cmd == "counter-show" and len(args) == 1:
        _, counter = read_key(args[0])
        print(counter)
        return 0
    if cmd == "encrypt" and len(args) == 4:
        keyfile, macfile, inp, outp = args
        w = SlogWriter.from_files(keyfile, macfile)
        n = 0
        with open(inp) as f, open(outp, "a") as out:
            for line in f:
                line = line.rstrip("\n")
                if not line:
                    continue
                out.write(w.entry(line) + "\n")
                n += 1
        w.save(keyfile, macfile)
        print(f"{n} entries encrypted; counter now {w.counter}")
        return 0
    if cmd == "verify":
        key_index = 0
        if "--key-index" in args:
            i = args.index("--key-index")
            key_index = int(args[i + 1])
            args = args[:i] + args[i + 2:]
        if len(args) != 4:
            print(__doc__)
            return 2
        keyfile, macfile, inp, outp = args
        key0, stored = read_key(keyfile)
        mac = read_mac(macfile)
        with open(inp) as f:
            lines = [ln.rstrip("\n") for ln in f if ln.rstrip("\n")]
        recovered, ok, problems = verify_entries(
            lines, key0, key0_index=key_index, big_mac=mac)
        with open(outp, "w") as out:
            for r in recovered:
                out.write(r + "\n")
        for p in problems:
            print(f"[SLOG] ERROR: {p}", file=sys.stderr)
        print(f"{len(recovered)} entries recovered; "
              f"verification {'OK' if ok else 'FAILED'}")
        return 0 if ok else 1
    print(__doc__)
    return 2


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
