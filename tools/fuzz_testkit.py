#!/usr/bin/env python3
"""Differential header fuzz over the testkit vectors (VERDICT r18 #4).

For every testkit vector, flip each bit of each byte in the mutation
region (the whole header; for armored vectors the whole armor block; for
success vectors additionally the payload nonce head and final-tag tail)
and CLASSIFY the mutant with the repo's independent Python age
implementation (tools/age_interop.py). The expected classes land in
src/test/resources/testkit-fuzz/fuzz_expected.tsv.gz;
graft.core.DifferentialFuzzSpec replays every mutant through the Scala
AgeFormat stack and asserts class agreement.

What this closes that the fixed 35-vector suite cannot: systematic
coverage of every header byte position — a divergent spec reading that
accepts/rejects or reclassifies ANY single-bit header corruption
differently in the two independently-written parsers fails the spec
loudly (designing this lane already found one: the JDK's lenient base64
accepted non-canonical trailing bits on the un-MACed MAC line —
AgeFormat.b64dCanonical). What it cannot close: a misreading REPLICATED
in both implementations (FIXTURES.md residual).

Classes (coarse on purpose — check ORDER inside one stage is
implementation-defined; stage identity is not):
  accept   — decrypts; for success vectors the plaintext hash must match
  version  — version-line rejection
  armor    — armor-layer rejection
  parse    — header-grammar / header-field rejection (incl. scrypt params)
  no_match — well-formed header, no usable stanza for the key material
  mac      — header MAC mismatch
  payload  — STREAM payload rejection
  crash:*  — unexpected exception type (must never appear; asserted here)

Deterministic: pure function of the committed vectors. Usage:
  fuzz_testkit.py [testkit_dir] [out.tsv.gz]
"""
import gzip, hashlib, os, sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import age_interop as age

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
KIT = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    REPO, "src/test/resources/testkit")
OUT = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
    REPO, "src/test/resources/testkit-fuzz/fuzz_expected.tsv.gz")

ASSERT_CLASS = {
    "bad version line": "version",
    "not an armored age file": "armor",
    "armored file missing END marker": "armor",
    "malformed armor line length": "armor",
    "malformed armor base64": "armor",
    "header MAC mismatch": "mac",
    "no stanza matched the provided key material": "no_match",
    "incorrect passphrase": "no_match",
    "truncated payload": "payload",
    "payload chunk authentication failed": "payload",
    "empty final chunk in multi-chunk payload": "payload",
}


def classify(data, identity=None, passphrase=None, want_sha=None):
    try:
        pt = age.decrypt(data, identity=identity, passphrase=passphrase)
        if want_sha is not None and hashlib.sha256(pt).hexdigest() != want_sha:
            return "accept_other"
        return "accept"
    except AssertionError as e:
        msg = str(e)
        for k, cls in ASSERT_CLASS.items():
            if msg.startswith(k):
                return cls
        return "parse"  # all remaining grammar/field assertions
    except ValueError:
        return "parse"  # next_line past EOF (= Scala "truncated header")
    except Exception as e:  # noqa: BLE001 — must never happen; surfaced
        return "crash:" + type(e).__name__


def vector(path):
    raw = open(path, "rb").read()
    head, _, body = raw.partition(b"\n\n")
    kv = dict(l.split(": ", 1) for l in head.decode().split("\n"))
    return kv, body


def payload_boundaries(body, off):
    """Chunk-boundary offsets inside the STREAM payload: the payload is a
    16-byte nonce prefix then chunks of (<=64 KiB ciphertext + 16 tag).
    Returns the absolute positions where chunk k ends / chunk k+1 begins."""
    plen = len(body) - off - 16
    full = age.CHUNK + 16
    bounds = []
    k = 1
    while k * full < plen:  # strict: a boundary needs bytes after it
        bounds.append(off + 16 + k * full)
        k += 1
    return bounds


def regions(kv, body):
    """Byte ranges to bit-flip: full armor block for armored vectors; else
    the header, plus — for any vector carrying payload bytes (v2, VERDICT
    r19 #5) — the full 16-byte nonce prefix, a ±18-byte window around
    every chunk boundary (where a chunking off-by-one would hide), and the
    final-tag tail."""
    if age.is_armored(body):
        return [(0, len(body))]  # armor blocks are small by construction
    try:
        _, _, _, off = age.parse_header(body)
    except Exception:
        off = min(len(body), 256)  # intentionally-broken headers
        return [(0, min(off, len(body)))]
    spans = [(0, min(off, len(body)))]
    if len(body) > off:
        spans.append((off, min(off + 16, len(body))))         # nonce prefix
        for b in payload_boundaries(body, off):               # chunk seams
            spans.append((max(off, b - 18), min(b + 18, len(body))))
        spans.append((max(off, len(body) - 16), len(body)))   # final tag
    # merge overlaps so no position is emitted twice
    spans.sort()
    merged = [spans[0]]
    for s, e in spans[1:]:
        if s <= merged[-1][1]:
            merged[-1] = (merged[-1][0], max(e, merged[-1][1]))
        else:
            merged.append((s, e))
    return merged


def framing_mutants(body, off):
    """v2 LENGTH mutants — bit flips cannot cover truncation/extension,
    which is exactly where final-flag and empty-final-chunk rules live.
    Truncations: a {1,16,17}-byte halo around the payload-data start,
    every chunk boundary, and EOF (clamped to the payload region — header
    truncation already has its own vector plus the whole-header flip
    lane). Extensions: {1,16,17} appended 0x00 bytes (trailing bytes
    after the final-flagged chunk must be rejected, not ignored)."""
    ops = []
    if len(body) <= off:
        return ops
    anchors = [off + 16] + payload_boundaries(body, off) + [len(body)]
    lens = set()
    for a in anchors:
        for d in (-17, -16, -1, 0, 1, 16, 17):
            length = a + d
            if off <= length < len(body):
                lens.add(length)
    ops += [("trunc", length) for length in sorted(lens)]
    ops += [("ext", n) for n in (1, 16, 17)]
    return ops


def main():
    files = sorted(f for f in os.listdir(KIT) if f.endswith(".age"))
    assert len(files) >= 30, f"testkit shrank: {files}"
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    n, crash, accept = 0, [], 0
    with gzip.open(OUT, "wt") as out:
        for f in files:
            kv, body = vector(os.path.join(KIT, f))
            ident = (age.parse_identity(kv["identity"])
                     if "identity" in kv else None)
            pw = kv.get("passphrase")
            out.write(f"#vector\t{f}\t{hashlib.sha256(body).hexdigest()}\n")
            for s, e in regions(kv, body):
                for pos in range(s, e):
                    for bit in range(8):
                        m = bytearray(body)
                        m[pos] ^= 1 << bit
                        cls = classify(bytes(m), identity=ident,
                                       passphrase=pw,
                                       want_sha=kv.get("payload"))
                        out.write(f"{f}\t{pos}\t{bit}\t{cls}\n")
                        n += 1
                        if cls.startswith("crash:"):
                            crash.append((f, pos, bit, cls))
                        if cls.startswith("accept"):
                            accept += 1
            # v2: payload-framing length mutants (trunc/ext rows)
            if not age.is_armored(body):
                try:
                    _, _, _, off = age.parse_header(body)
                except Exception:
                    off = len(body)
                for op, arg in framing_mutants(body, off):
                    m = body[:arg] if op == "trunc" else body + b"\x00" * arg
                    cls = classify(m, identity=ident, passphrase=pw,
                                   want_sha=kv.get("payload"))
                    out.write(f"{f}\t{op}\t{arg}\t{cls}\n")
                    n += 1
                    if cls.startswith("crash:"):
                        crash.append((f, op, arg, cls))
                    if cls.startswith("accept"):
                        accept += 1
            print(f"[fuzz] {f}: done ({n} total)", flush=True)
    print(f"[fuzz] {n} mutants, {accept} accepted, {len(crash)} crashes")
    if crash:
        for c in crash[:20]:
            print("  CRASH", c)
        sys.exit(1)


if __name__ == "__main__":
    main()
