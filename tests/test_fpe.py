"""Property tests for the FPE cipher (SURVEY.md §7.4.1 round-trip contract)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dlp_rdb_bq_import_spark.functions.fpe import (
    ALPHA_NUMERIC,
    NUMERIC,
    FPECipher,
    resolve_alphabet,
)

KEY = b"0123456789abcdef0123456789abcdef"


@given(st.text(alphabet=ALPHA_NUMERIC, min_size=0, max_size=64))
@settings(max_examples=200, deadline=None)
def test_roundtrip_alpha_numeric(plaintext):
    c = FPECipher(KEY, ALPHA_NUMERIC)
    token = c.encrypt(plaintext)
    assert len(token) == len(plaintext)
    assert all(ch in ALPHA_NUMERIC for ch in token)
    assert c.decrypt(token) == plaintext


@given(st.text(alphabet=NUMERIC, min_size=2, max_size=32))
@settings(max_examples=100, deadline=None)
def test_roundtrip_numeric(plaintext):
    c = FPECipher(KEY, "NUMERIC")
    token = c.encrypt(plaintext)
    assert token.isdigit() and len(token) == len(plaintext)
    assert c.decrypt(token) == plaintext


def test_custom_alphabet_age():
    """README.md:223-240 — custom alphabet '123456789' for patient.age."""
    c = FPECipher(KEY, "123456789")
    token = c.encrypt("45")
    assert set(token) <= set("123456789") and len(token) == 2
    assert c.decrypt(token) == "45"
    assert token != "45"


def test_deterministic_and_key_sensitive():
    c1 = FPECipher(KEY)
    c2 = FPECipher(KEY)
    c3 = FPECipher(b"another-key-another-key-another!")
    assert c1.encrypt("SecretValue1") == c2.encrypt("SecretValue1")
    assert c1.encrypt("SecretValue1") != c3.encrypt("SecretValue1")


def test_tweak_changes_output():
    c = FPECipher(KEY)
    assert c.encrypt("hello42", b"t1") != c.encrypt("hello42", b"t2")
    assert c.decrypt(c.encrypt("hello42", b"t1"), b"t1") == "hello42"


def test_non_alphabet_passthrough():
    c = FPECipher(KEY, NUMERIC)
    token = c.encrypt("647-780-3777")
    assert token[3] == "-" and token[7] == "-"
    assert token != "647-780-3777"
    assert c.decrypt(token) == "647-780-3777"


def test_strict_mode_raises():
    c = FPECipher(KEY, NUMERIC, strict=True)
    with pytest.raises(ValueError):
        c.encrypt("123a")


def test_short_inputs_pass_through():
    c = FPECipher(KEY, NUMERIC)
    assert c.encrypt("") == ""
    assert c.encrypt("7") == "7"


def test_resolve_alphabet():
    assert resolve_alphabet("NUMERIC") == NUMERIC
    assert resolve_alphabet("123456789") == "123456789"


def test_strict_cipher_not_served_from_lenient_memo():
    """Process-level memo must key on strict: a lenient cipher's cached
    pass-through for out-of-alphabet input must not satisfy a strict
    cipher's lookup (which is contractually a ValueError)."""
    import pandas as pd
    import pytest as _pytest

    from dlp_rdb_bq_import_spark.functions.fpe import FPECipher, NUMERIC
    from dlp_rdb_bq_import_spark.functions.tokenize import _fpe_map_series

    key = b"0123456789abcdef"
    s = pd.Series(["12!34"])
    lenient = _fpe_map_series(s, FPECipher(key, NUMERIC), True, b"t")
    assert lenient.iloc[0].count("!") == 1  # '!' passed through
    with _pytest.raises(ValueError):
        _fpe_map_series(s, FPECipher(key, NUMERIC, strict=True), True, b"t")
