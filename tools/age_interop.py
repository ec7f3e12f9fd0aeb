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
    nonce, body = payload[:16], payload[16:]
    key = hkdf(file_key, nonce, b"payload")
    aead = ChaCha20Poly1305(key)
    out = bytearray()
    step = CHUNK + 16
    n = max(1, (len(body) + step - 1) // step)
    for i in range(n):
        ch = body[i * step:(i + 1) * step]
        last = i == n - 1
        cn = i.to_bytes(11, "big") + (b"\x01" if last else b"\x00")
        out += aead.decrypt(cn, ch, None)
    return bytes(out)


def encrypt_x25519(plaintext, recipients):
    file_key = secrets.token_bytes(16)
    header = V1 + b"\n"
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
    end = 0
    lines = []
    while True:
        nl = data.index(b"\n", end)
        line = data[end:nl]
        lines.append((end, line))
        end = nl + 1
        if line.startswith(b"--- "):
            break
    assert lines[0][1] == V1, "bad version line"
    stanzas = []
    i = 1
    while i < len(lines) - 1:
        off, line = lines[i]
        assert line.startswith(b"-> "), f"bad stanza line {line!r}"
        args = line[3:].decode().split(" ")
        body = b""
        i += 1
        while i < len(lines) - 1 and not lines[i][1].startswith(b"-> "):
            body += lines[i][1]
            i += 1
        stanzas.append((args, b64d(body.decode())))
    mac_off, mac_line = lines[-1]
    macged = data[:mac_off] + b"---"
    return stanzas, mac_line[4:].decode(), macged, end


def dearmor(data):
    try:
        txt = data.decode().strip()
    except UnicodeDecodeError:
        return data  # binary (non-armored) ciphertext
    if not txt.startswith("-----BEGIN AGE ENCRYPTED FILE-----"):
        return data
    body = "".join(l for l in txt.splitlines()
                   if l and not l.startswith("-----"))
    return base64.b64decode(body)


def decrypt(data, identity=None, passphrase=None):
    data = dearmor(data)
    stanzas, mac_b64, macged, off = parse_header(data)
    file_key = None
    for args, body in stanzas:
        if args[0] == "X25519" and identity is not None:
            eph_pub = b64d(args[1])
            priv = X25519PrivateKey.from_private_bytes(identity)
            my_pub = priv.public_key().public_bytes_raw()
            shared = priv.exchange(X25519PublicKey.from_public_bytes(eph_pub))
            wrap_key = hkdf(shared, eph_pub + my_pub, X25519_INFO)
            try:
                file_key = ChaCha20Poly1305(wrap_key).decrypt(b"\x00" * 12, body, None)
                break
            except Exception:
                continue
        if args[0] == "scrypt" and passphrase is not None:
            salt, log_n = b64d(args[1]), int(args[2])
            key = Scrypt(salt=SCRYPT_LABEL + salt, length=32, n=1 << log_n,
                         r=8, p=1).derive(passphrase.encode())
            file_key = ChaCha20Poly1305(key).decrypt(b"\x00" * 12, body, None)
            break
    assert file_key is not None, "no stanza matched the provided key material"
    mac = hmac_sha256(hkdf(file_key, b"", b"header"), macged)
    assert b64e(mac) == mac_b64, "header MAC mismatch"
    return stream_decrypt(file_key, data[off:])


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
    else:
        sys.exit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
