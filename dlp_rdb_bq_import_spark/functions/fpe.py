"""Format-preserving encryption (FPE) — the native stand-in for the
reference's Cloud DLP ``cryptoReplaceFfxFpeConfig`` transform
(README.md:195-318; request built in common/DLPTokenizationDoFn.java:100-117).

Structure follows NIST SP 800-38G's FF1 (public spec): numeral-string
Feistel with alternating unbalanced halves and a per-round PRF over
(round, tweak, half). The PRF is HMAC-SHA256 (Python stdlib) rather than
AES-CBC-MAC — the container has no AES library and the engine's contract
is determinism + invertibility + format preservation, not FIPS
compliance. 10 rounds, matching FF1.

Properties (property-tested in tests/test_fpe.py):
- ``decrypt(encrypt(x)) == x`` for any x over the alphabet;
- output is the same length and drawn from the same alphabet (format
  preserved — a tokenized age like "45" still casts to int);
- deterministic per (key, tweak, alphabet) — equal values tokenize
  equally, so tokenized columns still group/join correctly;
- characters outside the alphabet pass through in place (so free text
  keeps its shape), with a strict mode that raises instead.

Alphabets mirror DLP's FfxCommonNativeAlphabet enum plus custom strings
(README.md:223-240 uses custom alphabet "123456789").
"""

from __future__ import annotations

import hashlib
import hmac

NUMERIC = "0123456789"
HEXADECIMAL = "0123456789ABCDEF"
UPPER_CASE_ALPHA_NUMERIC = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ"
ALPHA_NUMERIC = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"

ALPHABETS = {
    "NUMERIC": NUMERIC,
    "HEXADECIMAL": HEXADECIMAL,
    "UPPER_CASE_ALPHA_NUMERIC": UPPER_CASE_ALPHA_NUMERIC,
    "ALPHA_NUMERIC": ALPHA_NUMERIC,
}

_ROUNDS = 10


def resolve_alphabet(spec: str) -> str:
    """Named DLP alphabet or a literal custom alphabet string."""
    return ALPHABETS.get(spec, spec)


class FPECipher:
    """FF1-structured Feistel FPE over an arbitrary alphabet."""

    def __init__(self, key: bytes, alphabet: str = ALPHA_NUMERIC, strict: bool = False):
        alphabet = resolve_alphabet(alphabet)
        if len(set(alphabet)) != len(alphabet) or len(alphabet) < 2:
            raise ValueError("alphabet must have >= 2 distinct characters")
        self.key = key
        self.alphabet = alphabet
        self.radix = len(alphabet)
        self.strict = strict
        self._idx = {ch: i for i, ch in enumerate(alphabet)}

    # -- numeral-string helpers (FF1 NUM / STR primitives) ------------
    def _num(self, digits: list[int]) -> int:
        n = 0
        for d in digits:
            n = n * self.radix + d
        return n

    def _str(self, x: int, m: int) -> list[int]:
        out = [0] * m
        for i in range(m - 1, -1, -1):
            out[i] = x % self.radix
            x //= self.radix
        return out

    def _prf(self, tweak: bytes, rnd: int, half: list[int], n: int) -> int:
        msg = b"%d|%d|%d|" % (self.radix, n, rnd) + tweak + b"|" + bytes(
            b for d in half for b in d.to_bytes(2, "big")
        )
        digest = hmac.new(self.key, msg, hashlib.sha256).digest()
        return int.from_bytes(digest, "big")

    # -- core Feistel on digit lists ----------------------------------
    def _encrypt_digits(self, digits: list[int], tweak: bytes) -> list[int]:
        n = len(digits)
        u = n // 2
        a, b = digits[:u], digits[u:]
        for i in range(_ROUNDS):
            m = u if i % 2 == 0 else n - u
            y = self._prf(tweak, i, b, n)
            c = (self._num(a) + y) % (self.radix**m)
            a, b = b, self._str(c, m)
        return a + b

    def _decrypt_digits(self, digits: list[int], tweak: bytes) -> list[int]:
        n = len(digits)
        u = n // 2
        # replay the half-length sequence to know the final split point
        la, lb = u, n - u
        for i in range(_ROUNDS):
            m = u if i % 2 == 0 else n - u
            la, lb = lb, m
        a, b = digits[:la], digits[la:]
        for i in range(_ROUNDS - 1, -1, -1):
            m = u if i % 2 == 0 else n - u
            y = self._prf(tweak, i, a, n)
            c = (self._num(b) - y) % (self.radix**m)
            b, a = a, self._str(c, m)
        return a + b

    # -- public string API --------------------------------------------
    def _transform(self, text: str, tweak: bytes, forward: bool) -> str:
        positions = [i for i, ch in enumerate(text) if ch in self._idx]
        if self.strict and len(positions) != len(text):
            bad = next(ch for ch in text if ch not in self._idx)
            raise ValueError(f"character {bad!r} not in alphabet")
        if len(positions) < 2:
            return text  # FF1 needs >= 2 numerals; shorter input passes through
        digits = [self._idx[text[i]] for i in positions]
        out = (
            self._encrypt_digits(digits, tweak)
            if forward
            else self._decrypt_digits(digits, tweak)
        )
        chars = list(text)
        for pos, d in zip(positions, out):
            chars[pos] = self.alphabet[d]
        return "".join(chars)

    def encrypt(self, text: str, tweak: bytes = b"") -> str:
        return self._transform(text, tweak, forward=True)

    def decrypt(self, text: str, tweak: bytes = b"") -> str:
        return self._transform(text, tweak, forward=False)
