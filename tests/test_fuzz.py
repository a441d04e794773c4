"""Property-based robustness tests (hypothesis).

The extraction engine must never raise on arbitrary input bytes — the
reference swallows parser errors into report logs (dispatcher.py:254-255)
and so do we; a crash inside mapInArrow would fail a whole task at scale.
"""

import json
import string

from hypothesis import given, settings, strategies as st

from kgmwcp.engine import basecodec, vbe
from kgmwcp.engine.dispatcher import ExtractionEngine


@settings(max_examples=120, deadline=None)
@given(
    data=st.binary(min_size=0, max_size=4096),
    name=st.text(
        alphabet=string.ascii_letters + string.digits + "._-",
        min_size=0, max_size=24,
    ),
)
def test_engine_never_raises_on_arbitrary_bytes(data, name):
    result = ExtractionEngine().run(data, name=name or None)
    for source, pred, obj in result.triples:
        payload = json.loads(obj)       # every obj is valid JSON
        assert isinstance(payload, dict)
        assert isinstance(pred, str) and pred
        assert len(source.sha256) == 64


@settings(max_examples=80, deadline=None)
@given(data=st.binary(min_size=0, max_size=2048))
def test_engine_deterministic(data):
    a = ExtractionEngine().run(data, name="f.bin")
    b = ExtractionEngine().run(data, name="f.bin")
    assert [(s.sha256, p, o) for s, p, o in a.triples] == \
           [(s.sha256, p, o) for s, p, o in b.triples]


# printable subset the VBE encoder covers (it rejects codepoints it cannot
# produce, like raw control chars other than \t\r\n\0)
_VBE_ALPHABET = string.printable


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=_VBE_ALPHABET, min_size=0, max_size=300))
def test_vbe_roundtrip(text):
    assert vbe.decode_vbe_stream(vbe.encode_vbe_stream(text)) == text


@settings(max_examples=60, deadline=None)
@given(
    data=st.binary(min_size=0, max_size=256),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_basecodec_roundtrip_random_alphabet(data, seed):
    import random

    rng = random.Random(seed)
    standard = list(b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/")
    rng.shuffle(standard)
    # keep '=' as pad so the alphabet stays 65 unique chars
    alphabet = bytes(standard) + b"="
    encoded = basecodec.encode(data, alphabet=alphabet)
    assert basecodec.decode(encoded, alphabet=alphabet) == data
