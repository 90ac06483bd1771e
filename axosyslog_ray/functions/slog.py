"""Secure logging ($(slog)) — forward-secure encrypted log entries.

From-spec re-implementation of the reference's secure-logging module
(reference: modules/secure-logging/slog.c, slog.h, secure-logging.c;
the $(slog --key-file K --mac-file M msg) template function and the
slogkey / slogencrypt / slogverify tools):

- slog.h:26-42 — AES_BLOCKSIZE=16, IV_LENGTH=12, KEY_LENGTH=32,
  COUNTER_LENGTH=12 (base64 of the 8-byte LE counter), CTR_LEN_SIMPLE=20,
  IPAD=0x36 / OPAD=0x5C / EPAD=0x6A key-derivation patterns.
- slog.c:418 cmac() — AES-256-CMAC (CMAC over aes-256-cbc).
- slog.c:487 PRF() — CMAC in counter mode: block i is
  cmac(key, pattern with last byte += i), concatenated to out_len.
- slog.c:87-95 deriveEncSubKey/deriveMACSubKey — PRF over the
  IPAD/OPAD-filled 16-byte patterns.
- slog.c:467 evolveKey — key <- PRF(key, GAMMA=EPAD*16, 32); forward
  security: entry i is protected by key_i = evolve^i(k0).
- slog.c:305 sLogEntry — per-entry output line is
  base64(LE-uint64 counter) ':' base64(IV || GCM tag || ciphertext)
  with AES-256-GCM under the entry key's enc subkey (12-byte IV,
  16-byte tag, no AAD), and the aggregated MAC evolves as
  mac <- CMAC(mac_subkey_i, prev_mac || IV || tag || ct)
  (first entry of a run omits prev_mac, slog.c:357-370).
- slog.c:784 readKey / 904 writeKey — key file is
  key(32) || CMAC(key, LE-counter)(16) || LE-counter(8).
- slog.c:592 writeBigMAC / 688 readBigMAC — MAC file is
  mac(16) || CMAC(mac zero-padded to 32 as key, zeros(16))(16).
- slog.c:526 generateMasterKey, 546 deriveHostKey —
  k0 = SHA256(master || macAddr || serial).
- slog.c:1007 iterateBuffer + 1174 finalizeVerify — verification:
  derive per-entry keys by evolution, decrypt, rebuild the MAC chain,
  detect duplicate / out-of-order / missing counters (rewinding from
  k0 when an entry claims a past index), and compare the final
  aggregated MAC; recovered lines render as '%020x: <plaintext>'.

Scale note (Ray-native form): the reference's chain is inherently
sequential — one key evolution and one MAC per entry, in order. At
corpus scale the unit of sequentiality is the OUTPUT SHARD: each shard
gets its own independent chain (its own host key derived from the
master key and the shard name via derive_host_key), encrypted inside
one map task that iterates its shard's rows in order, so shards
encrypt in parallel while each chain keeps the reference's exact
byte format and tamper evidence. Cross-shard ordering is the sink
manifest's job, not the cipher's.

Crypto primitives come from the `cryptography` package (OpenSSL-backed,
same AES-CMAC / AES-256-GCM as the reference); everything layered on
top is from-spec. Import is guarded: HAVE_CRYPTO is False when the
package is absent and every entry point raises a clear error.
"""
from __future__ import annotations

import base64
import hashlib
import os
import struct

try:  # pragma: no cover - the sandbox ships cryptography
    from cryptography.hazmat.primitives.cmac import CMAC
    from cryptography.hazmat.primitives.ciphers import algorithms
    from cryptography.hazmat.primitives.ciphers.aead import AESGCM
    HAVE_CRYPTO = True
except Exception:  # pragma: no cover
    HAVE_CRYPTO = False

AES_BLOCKSIZE = 16
IV_LENGTH = 12
KEY_LENGTH = 32
CMAC_LENGTH = 16
COUNTER_LENGTH = 12          # len(base64(8 bytes)) == 12
CTR_LEN_SIMPLE = 20          # decimal/hex string width of a 64-bit counter

IPAD = 0x36
OPAD = 0x5C
EPAD = 0x6A
KEYPATTERN = bytes([IPAD] * AES_BLOCKSIZE)
MACPATTERN = bytes([OPAD] * AES_BLOCKSIZE)
GAMMA = bytes([EPAD] * AES_BLOCKSIZE)


def _require_crypto():
    if not HAVE_CRYPTO:
        raise RuntimeError(
            "secure logging needs the 'cryptography' package (AES-CMAC/GCM)")


def cmac(key: bytes, data: bytes) -> bytes:
    """AES-256-CMAC (slog.c:418)."""
    _require_crypto()
    c = CMAC(algorithms.AES(key))
    c.update(data)
    return c.finalize()


def prf(key: bytes, pattern: bytes, out_len: int) -> bytes:
    """CMAC-counter-mode PRF (slog.c:487): block i MACs the pattern with
    its LAST byte incremented i times (mod 256)."""
    buf = bytearray(pattern)
    out = bytearray()
    nblocks = out_len // AES_BLOCKSIZE + (1 if out_len % AES_BLOCKSIZE else 0)
    for _ in range(nblocks):
        out += cmac(key, bytes(buf))
        buf[-1] = (buf[-1] + 1) & 0xFF
    return bytes(out[:out_len])


def derive_enc_subkey(main_key: bytes) -> bytes:
    return prf(main_key, KEYPATTERN, KEY_LENGTH)


def derive_mac_subkey(main_key: bytes) -> bytes:
    return prf(main_key, MACPATTERN, KEY_LENGTH)


def evolve_key(key: bytes) -> bytes:
    """One forward-security step (slog.c:467)."""
    return prf(key, GAMMA, KEY_LENGTH)


def derive_key(key: bytes, to_index: int, from_index: int) -> bytes:
    """Evolve `key` (currently at from_index) up to to_index (slog.c:394)."""
    for _ in range(from_index, to_index):
        key = evolve_key(key)
    return key


def generate_master_key() -> bytes:
    return os.urandom(KEY_LENGTH)


def derive_host_key(master_key: bytes, mac_addr: str, serial: str) -> bytes:
    """k0 = SHA256(master || macAddr || serial) (slog.c:546)."""
    h = hashlib.sha256()
    h.update(master_key)
    h.update(mac_addr.encode())
    h.update(serial.encode())
    return h.digest()


# ---------------------------------------------------------------- files

def write_key(path: str, key: bytes, counter: int) -> None:
    """key(32) || CMAC(key, LE-counter)(16) || LE-counter(8) (slog.c:904)."""
    le = struct.pack("<Q", counter)
    with open(path, "wb") as f:
        f.write(key)
        f.write(cmac(key, le))
        f.write(le)


def read_key(path: str) -> tuple[bytes, int]:
    """Read + integrity-check a key file (slog.c:784). Raises ValueError
    on a corrupted file (CMAC mismatch), mirroring the reference's
    'Host key corrupted' error."""
    with open(path, "rb") as f:
        data = f.read()
    if len(data) != KEY_LENGTH + CMAC_LENGTH + 8:
        raise ValueError(f"invalid key file {path!r}: wrong size {len(data)}")
    key = data[:KEY_LENGTH]
    mac = data[KEY_LENGTH:KEY_LENGTH + CMAC_LENGTH]
    le = data[KEY_LENGTH + CMAC_LENGTH:]
    if cmac(key, le) != mac:
        raise ValueError(f"host key corrupted: CMAC mismatch in {path!r}")
    return key, struct.unpack("<Q", le)[0]


def write_mac(path: str, mac: bytes) -> None:
    """mac(16) || CMAC(mac zero-padded to 32, zeros(16)) (slog.c:592)."""
    keybuf = (mac + b"\x00" * KEY_LENGTH)[:KEY_LENGTH]
    with open(path, "wb") as f:
        f.write(mac)
        f.write(cmac(keybuf, b"\x00" * CMAC_LENGTH))


def read_mac(path: str) -> bytes:
    """Read + integrity-check a MAC file (slog.c:688)."""
    with open(path, "rb") as f:
        data = f.read()
    if len(data) != 2 * CMAC_LENGTH:
        raise ValueError(f"invalid MAC file {path!r}: wrong size {len(data)}")
    mac, check = data[:CMAC_LENGTH], data[CMAC_LENGTH:]
    keybuf = (mac + b"\x00" * KEY_LENGTH)[:KEY_LENGTH]
    if cmac(keybuf, b"\x00" * CMAC_LENGTH) != check:
        raise ValueError(f"aggregated MAC corrupted in {path!r}")
    return mac


# ---------------------------------------------------------------- entries

def slog_entry(counter: int, text: str | bytes, main_key: bytes,
               prev_mac: bytes | None, iv: bytes | None = None,
               ) -> tuple[str, bytes]:
    """Encrypt one entry under key_counter == main_key (slog.c:305).

    Returns (line, new_aggregated_mac). `iv` is injectable for
    deterministic tests; production callers leave it None (random).
    prev_mac=None starts the MAC chain fresh (slog.c:364-370 keys this
    on counter==0 when encrypting; the verifier keys it on
    entries-processed-this-run, iterateBuffer's *numberOfLogEntries)."""
    _require_crypto()
    pt = text.encode() if isinstance(text, str) else bytes(text)
    if not pt:
        raise ValueError("slog entries must be non-empty (reference errors on ct_length <= 0)")
    if iv is None:
        iv = os.urandom(IV_LENGTH)
    if len(iv) != IV_LENGTH:
        raise ValueError(f"IV must be {IV_LENGTH} bytes")
    enc_key = derive_enc_subkey(main_key)
    mac_key = derive_mac_subkey(main_key)
    ct_tag = AESGCM(enc_key).encrypt(iv, pt, None)   # ct || tag16
    ct, tag = ct_tag[:-AES_BLOCKSIZE], ct_tag[-AES_BLOCKSIZE:]
    counter_b64 = base64.b64encode(struct.pack("<Q", counter)).decode()
    line = f"{counter_b64:>{COUNTER_LENGTH}.{COUNTER_LENGTH}}:" + \
        base64.b64encode(iv + tag + ct).decode()
    chained = (iv + tag + ct) if prev_mac is None else (prev_mac + iv + tag + ct)
    return line, cmac(mac_key, chained)


class SlogWriter:
    """Stateful encryptor mirroring the $(slog) template function's state
    (secure-logging.c:60-70: key, counter, aggregated MAC). Feed entries
    in order; save() persists the evolved key + counter and the MAC so a
    later run (or the verifier's iterative mode) can continue the chain."""

    def __init__(self, key: bytes, counter: int = 0, mac: bytes | None = None):
        _require_crypto()
        self.key = key
        self.counter = counter
        self.mac = mac          # None until the first entry of this run
        self._fresh = mac is None

    @classmethod
    def from_files(cls, keypath: str, macpath: str | None = None):
        key, counter = read_key(keypath)
        mac = None
        if macpath is not None and os.path.exists(macpath) and counter > 0:
            mac = read_mac(macpath)
        return cls(key, counter, mac)

    def entry(self, text: str | bytes, iv: bytes | None = None) -> str:
        line, self.mac = slog_entry(self.counter, text, self.key,
                                    None if self._fresh else self.mac, iv=iv)
        self._fresh = False
        self.key = evolve_key(self.key)
        self.counter += 1
        return line

    def save(self, keypath: str, macpath: str) -> None:
        write_key(keypath, self.key, self.counter)
        if self.mac is not None:
            write_mac(macpath, self.mac)


def verify_entries(lines: list[str], key0: bytes, key0_index: int = 0,
                   expected_count: int | None = None,
                   big_mac: bytes | None = None,
                   ) -> tuple[list[str], bool, list[str]]:
    """Decrypt-and-verify a chain (slog.c:1007 iterateBuffer +
    1174 finalizeVerify).

    key0 is the key at index key0_index (0 for a fresh archive; the
    saved key file's counter for iterative verification). Returns
    (recovered_lines, ok, problems): recovered lines are
    '%020x: <plaintext>' like the reference's output; ok is False on
    any decrypt failure, duplicate/missing counter, or MAC mismatch."""
    _require_crypto()
    problems: list[str] = []
    ok = True
    key_zero = key0
    main_key = key0
    next_entry = key0_index
    processed = 0
    chain_mac: bytes | None = None
    seen: set[int] = set()
    recovered: list[str] = []
    start = key0_index

    for raw in lines:
        if len(raw) <= COUNTER_LENGTH + 1:
            problems.append(f"cannot read log entry {next_entry}")
            ok = False
            continue
        try:
            on_disk = struct.unpack(
                "<Q", base64.b64decode(raw[:COUNTER_LENGTH]))[0]
        except Exception:
            problems.append(f"cannot derive counter near entry {next_entry}")
            on_disk = next_entry
        if on_disk != next_entry:
            if on_disk in seen:
                problems.append(f"duplicate entry {on_disk}")
                ok = False
            if on_disk < next_entry:
                if on_disk < key0_index:
                    problems.append(
                        f"entry {on_disk} predates key0 index {key0_index}; cannot rewind")
                    ok = False
                    # reference still attempts derivation from keyZero below
                else:
                    problems.append(f"entry {on_disk} is in the past; rewinding from k0")
                    main_key = derive_key(key_zero, on_disk, key0_index)
                    next_entry = on_disk
                    ok = False
            if on_disk > next_entry:
                main_key = derive_key(main_key, on_disk, next_entry)
                next_entry = on_disk
        pt = None
        try:
            bin_buf = base64.b64decode(raw[COUNTER_LENGTH + 1:])
            if len(bin_buf) > IV_LENGTH + AES_BLOCKSIZE:
                iv = bin_buf[:IV_LENGTH]
                tag = bin_buf[IV_LENGTH:IV_LENGTH + AES_BLOCKSIZE]
                ct = bin_buf[IV_LENGTH + AES_BLOCKSIZE:]
                enc_key = derive_enc_subkey(main_key)
                pt = AESGCM(enc_key).decrypt(iv, ct + tag, None)
        except Exception:
            pt = None
        if pt is None:
            problems.append(f"decryption failed for entry {on_disk}")
            ok = False
        else:
            recovered.append(f"{on_disk:0{CTR_LEN_SIMPLE}x}: {pt.decode(errors='replace')}")
            seen.add(on_disk)
            mac_key = derive_mac_subkey(main_key)
            body = bin_buf[:IV_LENGTH + AES_BLOCKSIZE + len(pt)]
            chained = body if processed == 0 else chain_mac + body
            chain_mac = cmac(mac_key, chained)
        main_key = evolve_key(main_key)
        processed += 1
        next_entry += 1

    count = expected_count if expected_count is not None else processed
    for i in range(start, start + count):
        if i not in seen:
            problems.append(f"unable to recover entry {i}")
            ok = False
    if big_mac is not None:
        if chain_mac is None or chain_mac != big_mac:
            problems.append("aggregated MAC mismatch")
            ok = False
    return recovered, ok, problems


# ---------------------------------------------------------------- Ray side

def encrypt_shards(ds, text_col: str, master_key: bytes, out_dir: str,
                   shard_col: str, order_col: str,
                   num_buckets: int | None = None):
    """Encrypt a Dataset into per-shard slog chains (the Ray-native form
    of the sequential $(slog) destination — see the module docstring).

    Each distinct `shard_col` value becomes one chain: host key
    derive_host_key(master_key, 'shard', <shard>), entries ordered by
    `order_col`, files <shard>.slog / <shard>.key / <shard>.mac under
    out_dir. Returns a per-shard summary DataFrame (shard, entries).
    Shards encrypt in parallel (bucketed map_groups); each chain is
    sequential inside its task, as the construction requires."""
    import pandas as pd
    from ..shuffle import bucketed_map_groups

    os.makedirs(out_dir, exist_ok=True)
    mk = bytes(master_key)

    def encrypt_one(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for shard, rows in g.groupby(shard_col, sort=False):
            rows = rows.sort_values(order_col, kind="mergesort")
            w = SlogWriter(derive_host_key(mk, "shard", str(shard)))
            lines = [w.entry(t) for t in rows[text_col].astype(str)]
            base = os.path.join(out_dir, str(shard))
            with open(base + ".slog", "w") as f:
                f.write("\n".join(lines) + "\n")
            w.save(base + ".key", base + ".mac")
            out.append({"shard": str(shard), "entries": len(lines)})
        return pd.DataFrame(out, columns=["shard", "entries"])

    return bucketed_map_groups(ds, shard_col, encrypt_one,
                               num_buckets=num_buckets)


def verify_shard(out_dir: str, shard: str, master_key: bytes,
                 ) -> tuple[list[str], bool, list[str]]:
    """Verify one shard chain written by encrypt_shards (slogverify's
    'normal' mode: k0 re-derived from the master key, counter 0)."""
    base = os.path.join(out_dir, str(shard))
    with open(base + ".slog") as f:
        lines = [ln for ln in f.read().splitlines() if ln]
    k0 = derive_host_key(bytes(master_key), "shard", str(shard))
    mac = read_mac(base + ".mac")
    return verify_entries(lines, k0, 0, expected_count=len(lines),
                          big_mac=mac)


def tf_slog(t, *raw_args):
    """$(slog -k keyfile -m macfile $MSG): the reference's stateful
    encrypting template function (secure-logging.c tf_slog_call) —
    rows encrypt SEQUENTIALLY against the evolving key persisted in the
    key/MAC files, exactly the on-disk contract slogverify consumes.
    Single-process semantics by construction (the config engine renders
    destination templates driver-side); the distributed form is
    encrypt_shards (one chain per shard). An empty message renders the
    reference's serialization error text."""
    import pandas as pd

    from .templates import Template

    args = list(raw_args)
    keyfile = macfile = None
    rest = []
    i = 0
    while i < len(args):
        a = args[i]
        if a in ("-k", "--key-file") and i + 1 < len(args):
            keyfile, i = args[i + 1], i + 2
        elif a in ("-m", "--mac-file") and i + 1 < len(args):
            macfile, i = args[i + 1], i + 2
        else:
            rest.append(a)
            i += 1
    if not keyfile or not macfile or not rest:
        raise ValueError("$(slog) usage: $(slog -k keyfile -m macfile $MSG)")
    texts = Template(" ".join(rest)).eval(t)
    w = SlogWriter.from_files(keyfile,
                              macfile if os.path.exists(macfile) else None)
    out = []
    for x in texts.tolist():
        if not x:
            # tf_slog_call's empty-input branch
            out.append("Error: Empty log message invalid")
            continue
        out.append(w.entry(x))
    w.save(keyfile, macfile)
    return pd.Series(out, dtype=object)


tf_slog._lazy_all = True  # type: ignore[attr-defined]
