#!/usr/bin/env python3
"""Generate the local age-v1 adversarial vector suite (VERDICT r17 #2).

The real C2SP CCTV "age" testkit is unreachable from this container (zero
egress), so this generator produces a testkit-FORMAT-compatible suite from
the repo's independent Python age implementation (tools/age_interop.py —
written from the public spec on OpenSSL primitives, sharing no code with
the Scala stack). Honest scope: these vectors close the PARSER-ROBUSTNESS
and framing-edge classes (truncation, MAC tampering, version/stanza/armor
malformations, chunk-boundary and empty-chunk edges, work-factor limits);
they cannot close the shared-spec-misreading class the way the upstream
vectors would — that residual is documented in FIXTURES.md.

Vector file format (CCTV style): ASCII `key: value` header lines, one
blank line, then the raw age file bytes.
  expect:      success | header failure | payload failure | armor failure
               | no match
  identity:    bech32 AGE-SECRET-KEY-... (decrypt with this)
  passphrase:  scrypt passphrase
  payload:     SHA-256 hex of the expected plaintext (success only)
  scala_error: exact AgeInvalidInputException message suffix expected from
               graft.core.AgeFormat (repo extension of the format)
  comment:     what the vector pins

Deterministic: all randomness comes from a fixed-seed DRBG, so re-running
regenerates byte-identical vectors (the suite is committed; this script is
its provenance).

Usage: gen_testkit.py [outdir]   # default src/test/resources/testkit
"""
import hashlib, os, sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import age_interop as age

# --- deterministic DRBG in place of secrets.token_bytes -------------------
_ctr = [0]
def _det_bytes(n):
    out = b""
    while len(out) < n:
        out += hashlib.sha256(b"graft-testkit-%d" % _ctr[0]).digest()
        _ctr[0] += 1
    return out[:n]
age.secrets.token_bytes = _det_bytes

# X25519PrivateKey.generate() draws from OpenSSL's RNG, NOT token_bytes —
# the one hole in the determinism story (r20: the pre-r20 committed suite
# was NOT reproducible from this script because of it; ephemeral keys now
# ride the same DRBG, so `expect`-identical re-runs are byte-identical).
_RealX25519 = age.X25519PrivateKey
class _DetX25519:
    generate = staticmethod(
        lambda: _RealX25519.from_private_bytes(_det_bytes(32)))
    from_private_bytes = _RealX25519.from_private_bytes
age.X25519PrivateKey = _DetX25519

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(REPO, "src/test/resources/golden")
OUT = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    REPO, "src/test/resources/testkit")
os.makedirs(OUT, exist_ok=True)

def keypair(name):
    pub, sec = open(os.path.join(GOLDEN, name)).read().split()
    return age.parse_recipient(pub), sec  # (raw 32B recipient, bech32 id)

REC1, ID1 = keypair("keypair.txt")
REC2, ID2 = keypair("keypair2.txt")

PT = b"testkit vector payload: the quick brown fox jumps over the lazy dog\n"
PASS = "correct horse battery staple"

def sha256hex(b):
    return hashlib.sha256(b).hexdigest()

written = []
def emit(name, header, body):
    head = "".join(f"{k}: {v}\n" for k, v in header) + "\n"
    with open(os.path.join(OUT, name + ".age"), "wb") as f:
        f.write(head.encode() + body)
    written.append(name)

def hfail(name, body, err, comment, identity=ID1, passphrase=None):
    h = [("expect", "header failure")]
    if passphrase is not None:
        h.append(("passphrase", passphrase))
    else:
        h.append(("identity", identity))
    h += [("scala_error", err), ("comment", comment)]
    emit(name, h, body)

def pfail(name, body, err, comment, identity=ID1):
    emit(name, [("expect", "payload failure"), ("identity", identity),
                ("scala_error", err), ("comment", comment)], body)

def ok(name, body, pt, comment, identity=ID1, passphrase=None):
    h = [("expect", "success")]
    if passphrase is not None:
        h.append(("passphrase", passphrase))
    else:
        h.append(("identity", identity))
    h += [("payload", sha256hex(pt)), ("comment", comment)]
    emit(name, h, body)

# --- base artifacts (deterministic) ---------------------------------------
base = age.encrypt_x25519(PT, [REC1])
base2 = age.encrypt_x25519(PT, [REC1, REC2])
scry = age.encrypt_scrypt(PT, PASS, log_n=10)

def header_end(data):
    """offset one past the newline of the '--- MAC' line"""
    i = data.index(b"\n--- ") + 1
    return data.index(b"\n", i) + 1

# --- success vectors ------------------------------------------------------
ok("x25519_base", base, PT, "single-recipient round trip")
ok("x25519_second_recipient", base2, PT,
   "second stanza unwraps when the first is not ours", identity=ID2)
ok("scrypt_base", scry, PT, "scrypt round trip, log_n=10", passphrase=PASS)
ok("grease_one", age.encrypt_x25519(PT, [REC1], grease=[
    (["grease-7f", "Zm9v"], _det_bytes(13))]), PT,
   "unknown stanza type before the real one must be skipped and MACed")
ok("grease_empty_terminator", age.encrypt_x25519(PT, [REC1], grease=[
    (["vanilla"], _det_bytes(48))]), PT,
   "48-byte grease body -> base64 exactly 64 cols -> EMPTY terminator line")
ok("empty_plaintext", age.encrypt_x25519(b"", [REC1]), b"",
   "zero-byte plaintext: single empty FINAL chunk is legal at counter 0")
pt64k = age.ladder_pt(64 * 1024, 7)
ok("chunk_full_final", age.encrypt_x25519(pt64k, [REC1]), pt64k,
   "exactly one full 64 KiB chunk carrying the final flag")
pt64k1 = age.ladder_pt(64 * 1024 + 1, 8)
ok("chunk_full_plus_one", age.encrypt_x25519(pt64k1, [REC1]), pt64k1,
   "64 KiB + 1: full non-final chunk then 1-byte final chunk")

# --- armor ----------------------------------------------------------------
def armor(raw):
    import base64
    b = base64.b64encode(raw).decode()
    lines = [b[i:i + 64] for i in range(0, len(b), 64)]
    return ("-----BEGIN AGE ENCRYPTED FILE-----\n" + "\n".join(lines) +
            "\n-----END AGE ENCRYPTED FILE-----\n").encode()

arm = armor(base)
ok("armor_base", arm, PT, "canonical 64-column armor")
ok("armor_crlf", arm.replace(b"\n", b"\r\n"), PT,
   "CRLF line endings are tolerated (per-line trim)")
bad_len = arm.split(b"\n")
bad_len.insert(2, b"QUJD")  # 4-char line in the middle of the body
hfail("armor_bad_line_length", b"\n".join(bad_len),
      "malformed armor line length",
      "non-final armor line shorter than 64 columns must be rejected")
hfail("armor_bad_base64", arm.replace(b"\n-----END", b"*\n-----END", 1),
      "malformed armor base64", "illegal base64 character in armor body")

# --- header failures ------------------------------------------------------
hfail("wrong_version", base.replace(b"/v1", b"/v2", 1),
      "not an age v1 file", "future version line must be rejected")
hfail("truncated_header_eof", base[: base.index(b"\n--- ") - 4],
      "truncated header", "EOF inside a stanza body")
hfail("no_stanzas",
      # header with zero stanzas; MAC bytes well-formed but unreachable
      b"age-encryption.org/v1\n--- " + base[base.index(b"\n--- ") + 5:header_end(base)],
      "no recipient stanzas", "a header must carry at least one stanza")
mac_at = base.index(b"\n--- ") + 5
flip = bytearray(base)
flip[mac_at + 3] = ord("A") if flip[mac_at + 3] != ord("A") else ord("B")
hfail("bad_mac", bytes(flip), "header MAC mismatch",
      "one flipped base64 char in the MAC line")
short_mac = (base[:mac_at] + age.b64e(_det_bytes(16)).encode() +
             base[header_end(base) - 1:])
hfail("mac_wrong_length", short_mac, "malformed header MAC",
      "16-byte MAC must be rejected at parse (32 canonical bytes required)")

# --- unpadded-tail canonicality (r19, differential-fuzz lane) -------------
# The MAC line is the ONE header field the MAC itself cannot protect:
# lenient decoders (JDK default, python validate=False) accept non-zero
# discarded trailing bits, so flipping them yields a DIFFERENT base64
# string that still authenticates — header malleability upstream age
# killed by moving to strict base64. 32 bytes -> 43 chars -> 2 discarded
# low bits in the final char; flip one and require rejection.
B64CHARS = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"
def flip_trailing_bit(line_b64):
    last = line_b64[-1:].decode()
    return line_b64[:-1] + B64CHARS[B64CHARS.index(last) ^ 1].encode()

_mlines = base.split(b"\n")
_mi = next(i for i, l in enumerate(_mlines) if l.startswith(b"--- "))
_mlines[_mi] = b"--- " + flip_trailing_bit(_mlines[_mi][4:])
hfail("mac_noncanonical_b64", b"\n".join(_mlines), "malformed header MAC",
      "non-zero discarded trailing bits in the MAC base64: same 32 bytes, "
      "different string — must be rejected, the MAC line is not MACed")

_clines = base.split(b"\n")  # line 2 = 43-char wrapped-key body (short line)
_clines[2] = flip_trailing_bit(_clines[2])
hfail("stanza_body_noncanonical", b"\n".join(_clines),
      "malformed stanza body",
      "non-canonical trailing bits in the final stanza-body line")

_alines2 = base.split(b"\n")
_alines2[1] = _alines2[1][:12] + b"\xc3" + _alines2[1][13:]
hfail("stanza_nonascii_arg", b"\n".join(_alines2), "malformed header",
      "high byte inside a stanza argument: header grammar is printable ASCII")

hfail("scrypt_workfactor_leading_zero",
      scry.replace(b" 10\n", b" 010\n", 1),
      "malformed scrypt work factor",
      "leading-zero work factor must not alias 10 (canonical decimal rule)",
      passphrase=PASS)

# --- r19 code-review rules ------------------------------------------------
# over-long body line: rewrap base's grease-free 43-char wrapped-key body
# as a single 66-char line by splicing a second stanza's... simpler: build
# a synthetic stanza whose body is 66 chars on one line (spec: EXACTLY 64
# until the first short line — 66 is malformed framing, not a long body)
_ol = base.split(b"\n")
_ol.insert(1, b"-> overlong")
_ol.insert(2, age.b64e(_det_bytes(48)).encode() + b"AB")  # 64+2 = 66 chars
hfail("stanza_body_overlong_line", b"\n".join(_ol),
      "malformed stanza body",
      "66-char body line: wrapping is exactly 64 columns until the first "
      "short line; an over-long line is malformed framing")

# padded 64-char body line: 47 bytes base64-encode to 63 chars, +1 '=' of
# padding = exactly 64 columns ending in '='. The JDK's LENIENT decoder
# accepts terminal padding inside such a line (47 bytes, body loop
# continues) where upstream age's unpadded-wrapping rule and the twin's
# canonical concatenated-body decode both reject — the class divergence
# ADVICE r19 flagged (no committed 64-char body line happened to end one
# bit-flip from '='). Empty terminator follows so the Python-side failure
# is the canonical check, not line framing.
_pl = base.split(b"\n")
import base64 as _b64
_pl.insert(1, b"-> padded")
_pl.insert(2, _b64.b64encode(_det_bytes(47)))  # 63 chars + '=' = 64 cols
_pl.insert(3, b"")
assert len(_pl[2]) == 64 and _pl[2].endswith(b"=")
hfail("stanza_body_padded_64col", b"\n".join(_pl),
      "malformed stanza body",
      "64-col body line with terminal '=' padding: spec wrapping is "
      "unpadded base64; padded lines are malformed, not bijective")

# scrypt stanza sharing a header with an X25519 stanza must be rejected
# UNCONDITIONALLY (parse-level rule) — here decrypted with an IDENTITY,
# pinning that the rule does not depend on which key material is supplied
sc2_lines = scry.split(b"\n", 1)
x_stanza2 = (b"-> X25519 " + age.b64e(_det_bytes(32)).encode() + b"\n" +
             age.b64e(_det_bytes(32)).encode() + b"\n")
hfail("scrypt_not_sole_identity_path",
      sc2_lines[0] + b"\n" + x_stanza2 + sc2_lines[1],
      "scrypt stanza must be the only stanza",
      "sole-scrypt is a header-validity rule, enforced on the identity "
      "path too (r19)", identity=ID1)
# corrupt the stanza BODY line (line 2 of `base`): illegal base64 char
_blines = base.split(b"\n")
_blines[2] = b"!" + _blines[2][1:]
hfail("stanza_bad_base64", b"\n".join(_blines),
      "malformed stanza body", "illegal base64 in a stanza body line")
# corrupt the ARGS line share instead: the parser must SKIP the
# undecodable share (tolerance) and end with no matching key
_alines = base.split(b"\n")
_alines[1] = b"-> X25519 !" + _alines[1][11:]
emit("x25519_bad_share_b64", [("expect", "no match"), ("identity", ID1),
     ("scala_error", "no matching key found"),
     ("comment", "undecodable ephemeral share is skipped, not a crash")],
     b"\n".join(_alines))

# stanza body whose final line is exactly 64 chars with NO short
# terminator: the '--- MAC' line is then parsed as a body line
g48 = age.encrypt_x25519(PT, [REC1], grease=[(["vanilla"], _det_bytes(48))])
lines = g48.split(b"\n")
gi = lines.index(b"-> vanilla")
assert lines[gi + 2] == b"", "expected empty terminator after 64-col body"
del lines[gi + 2]
hfail("stanza_missing_terminator", b"\n".join(lines),
      "malformed stanza body",
      "64-col body line must be followed by a short terminator line; "
      "the MAC line is not valid body base64")

# --- key-matching failures ------------------------------------------------
emit("wrong_identity", [("expect", "no match"), ("identity", ID2),
     ("scala_error", "no matching key found"),
     ("comment", "correctly MACed file, but no stanza for this identity")],
     base)
# only stanza carries a 16-byte ephemeral share: skipped as not-ours
fk = _det_bytes(16)
short_share_hdr = (b"age-encryption.org/v1\n-> X25519 " +
                   age.b64e(_det_bytes(16)).encode() + b"\n" +
                   age.b64e(_det_bytes(32)).encode() + b"\n")
mac = age.hmac_sha256(age.hkdf(fk, b"", b"header"), short_share_hdr + b"---")
short_share = (short_share_hdr + b"--- " + age.b64e(mac).encode() + b"\n" +
               age.stream_encrypt(fk, PT))
emit("x25519_short_share", [("expect", "no match"), ("identity", ID1),
     ("scala_error", "no matching key found"),
     ("comment", "16-byte ephemeral share must be skipped, not crash")],
     short_share)

# --- scrypt failures ------------------------------------------------------
hfail("scrypt_work_factor_21",
      scry.replace(b" 10\n", b" 21\n", 1),
      "scrypt work factor too large",
      "log_n 21 exceeds the hostile-work-factor cap (MaxScryptLogN=20); "
      "must be rejected BEFORE deriving", passphrase=PASS)
hfail("scrypt_work_factor_nonnumeric",
      scry.replace(b" 10\n", b" ten\n", 1),
      "malformed scrypt work factor",
      "non-numeric work factor", passphrase=PASS)
# scrypt stanza must be the sole stanza: prepend an X25519 stanza
sc_lines = scry.split(b"\n", 1)
x_stanza = (b"-> X25519 " + age.b64e(_det_bytes(32)).encode() + b"\n" +
            age.b64e(_det_bytes(32)).encode() + b"\n")
hfail("scrypt_not_sole_stanza",
      sc_lines[0] + b"\n" + x_stanza + sc_lines[1],
      "scrypt stanza must be the only stanza",
      "spec: an scrypt stanza must be alone in the header", passphrase=PASS)
emit("scrypt_wrong_passphrase", [("expect", "no match"),
     ("passphrase", "not the passphrase"),
     ("scala_error", "incorrect passphrase"),
     ("comment", "well-formed scrypt file, wrong passphrase")], scry)

# --- payload failures -----------------------------------------------------
pfail("payload_missing", base[:header_end(base)] + b"\x00" * 10,
      "truncated payload", "less than nonce+tag after the header")
pfail("payload_short_final", base[:-8],
      "payload chunk authentication failed",
      "final chunk cut by 8 bytes fails Poly1305")
pb = bytearray(base)
pb[-1] ^= 0x01
pfail("payload_bitflip", bytes(pb),
      "payload chunk authentication failed", "one flipped payload bit")

def raw_stream(file_key, chunks):
    """hand-built STREAM payload: chunks = [(bytes, is_final), ...]"""
    from cryptography.hazmat.primitives.ciphers.aead import ChaCha20Poly1305
    nonce = _det_bytes(16)
    key = age.hkdf(file_key, nonce, b"payload")
    out = bytearray(nonce)
    aead = ChaCha20Poly1305(key)
    for i, (ch, last) in enumerate(chunks):
        cn = i.to_bytes(11, "big") + (b"\x01" if last else b"\x00")
        out += aead.encrypt(cn, ch, None)
    return bytes(out)

def with_payload(payload):
    """re-head `base`'s header (same file key) onto a custom payload"""
    return base[:header_end(base)] + payload

# recover base's file key by decrypting with our own python impl
base_fk_pt, base_fk = None, None
# re-derive: python decrypt() returns plaintext only; rebuild the file key
# the same way it does
_stanzas, _mac, _macged, _off = age.parse_header(base)
_id_raw = age.parse_identity(ID1)
from cryptography.hazmat.primitives.asymmetric.x25519 import (
    X25519PrivateKey, X25519PublicKey)
from cryptography.hazmat.primitives.ciphers.aead import ChaCha20Poly1305
_priv = X25519PrivateKey.from_private_bytes(_id_raw)
_pub = _priv.public_key().public_bytes_raw()
for _args, _body in _stanzas:
    if _args[0] == "X25519" and len(_args) == 2:
        _eph = age.b64d(_args[1])
        _shared = _priv.exchange(X25519PublicKey.from_public_bytes(_eph))
        _wk = age.hkdf(_shared, _eph + _pub, age.X25519_INFO)
        base_fk = ChaCha20Poly1305(_wk).decrypt(b"\x00" * 12, _body, None)
assert base_fk is not None and age.stream_decrypt(
    base_fk, base[header_end(base):]) == PT, "file-key recovery failed"

pfail("empty_final_chunk_multichunk",
      with_payload(raw_stream(base_fk, [(b"\x00" * age.CHUNK, False), (b"", True)])),
      "empty final chunk in multi-chunk payload",
      "full chunk + empty final chunk: spec forbids an empty non-sole chunk")
pfail("final_flag_missing",
      with_payload(raw_stream(base_fk, [(PT, False)])),
      "payload chunk authentication failed",
      "sole chunk sealed WITHOUT the final flag must not authenticate")

# regression guard: every success vector must round-trip in python too
for name in written:
    path = os.path.join(OUT, name + ".age")
    raw = open(path, "rb").read()
    head, _, body = raw.partition(b"\n\n")
    kv = dict(l.split(": ", 1) for l in head.decode().split("\n"))
    if kv["expect"] != "success":
        continue
    ident = (age.parse_identity(kv["identity"])
             if "identity" in kv else None)
    pt = age.decrypt(body, identity=ident, passphrase=kv.get("passphrase"))
    assert sha256hex(pt) == kv["payload"], f"python round-trip failed: {name}"

print(f"wrote {len(written)} vectors to {OUT}")
