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


@settings(max_examples=150, deadline=None)
@given(code=st.text(min_size=0, max_size=300))
def test_posh_deobfuscate_total(code):
    """The hand-written recursive-descent PS grammar must terminate and
    never raise on arbitrary text, and its rewrite must be idempotent
    (fixpoint output re-deobfuscates to itself)."""
    from kgmwcp.engine import posh

    out, strings = posh.deobfuscate(code)
    assert isinstance(out, str)
    assert all(isinstance(s, str) and s for s in strings)
    out2, _ = posh.deobfuscate(out)
    assert out2 == out


@settings(max_examples=150, deadline=None)
@given(code=st.text(
    alphabet="'\"()+,-.[]$ `\\fFjJoOiInNsSpPlLiItTcCrReEaAhHxXgG0123456789",
    min_size=0, max_size=200,
))
def test_posh_deobfuscate_total_operator_soup(code):
    """Same, over an alphabet dense in grammar tokens (quotes, operators,
    keyword letters) to hit the parser's backtracking paths."""
    from kgmwcp.engine import posh

    out, _ = posh.deobfuscate(code)
    out2, _ = posh.deobfuscate(out)
    assert out2 == out


@settings(max_examples=150, deadline=None)
@given(data=st.binary(min_size=0, max_size=4096))
def test_format_views_never_raise(data):
    """parse_elf / parse_macho / IsoReader probes must be total on
    arbitrary bytes (the obtain_* contract: None, never an exception)."""
    from kgmwcp.engine import elf, iso9660, macho

    e = elf.parse_elf(data)
    if e is not None:
        list(e.sections())
        _ = e.architecture
    m = macho.parse_macho(data)
    if m is not None:
        _ = m.cpu_types()
        for sl in m.slices:
            list(sl.sections())
    assert iso9660.is_iso(data) in (True, False)


@settings(max_examples=60, deadline=None)
@given(data=st.binary(min_size=0, max_size=2048), seed=st.integers(0, 2**31))
def test_elf_mutation_never_raises(data, seed):
    """Bit-flipped REAL ELF images (valid magic, corrupted structure)."""
    import random as _r

    from kgmwcp import fixtures
    from kgmwcp.engine import elf

    base = bytearray(fixtures.elf_payload(0))
    rng = _r.Random(seed)
    for _ in range(8):
        base[rng.randrange(16, len(base))] = rng.randrange(256)
    e = elf.parse_elf(bytes(base))
    if e is not None:
        list(e.sections())
        _ = e.architecture


@settings(max_examples=150, deadline=None)
@given(data=st.binary(min_size=0, max_size=4096))
def test_media_parsers_total_on_arbitrary_bytes(data):
    """parse_bmp/parse_wav return a dict or None on ANY input — never
    raise (they guard every fixed-offset read)."""
    from kgmwcp.engine import media

    for parser in (media.parse_bmp, media.parse_wav):
        out = parser(data)
        assert out is None or isinstance(out, dict)


@settings(max_examples=120, deadline=None)
@given(data=st.binary(min_size=0, max_size=2048),
       seed=st.integers(min_value=0, max_value=2**32 - 1))
def test_media_parsers_total_on_corrupted_valid_files(data, seed):
    """Bit-flipped real BMP/WAV files parse or reject, never crash —
    the adversarial case a malware corpus actually presents."""
    import random

    from kgmwcp.engine import media

    rng = random.Random(seed)
    base = media.make_bmp(9, 7, 3, seed=seed % 256) if seed % 2 else \
        media.make_wav(2, 8000, 33, seed=seed % 256)
    corrupted = bytearray(base + data)
    for _ in range(8):
        corrupted[rng.randrange(len(corrupted))] ^= 1 << rng.randrange(8)
    for parser in (media.parse_bmp, media.parse_wav):
        out = parser(bytes(corrupted))
        assert out is None or isinstance(out, dict)


@settings(max_examples=80, deadline=None)
@given(data=st.binary(min_size=0, max_size=4096))
def test_udf_walk_total_on_arbitrary_tail(data):
    """An ISO whose UDF anchor region is arbitrary bytes must either walk
    or report no UDF — never raise (tag checksums gate every descriptor)."""
    from kgmwcp.engine import iso9660

    img = bytearray(iso9660.build_udf_bridge({"a.txt": b"payload"}))
    # overwrite the anchor sector region with fuzz bytes
    off = 256 * iso9660.SECTOR
    img[off:off + len(data)] = data
    reader = iso9660.IsoReader(bytes(img))
    assert isinstance(list(reader.walk("udf")), list)


@settings(max_examples=120, deadline=None)
@given(data=st.binary(min_size=0, max_size=2048),
       seed=st.integers(min_value=0, max_value=2**32 - 1))
def test_media_resize_and_features_total(data, seed):
    """resize_bmp_nearest / wav_features are total like the parsers:
    arbitrary bytes, truncations (the bounds-guard class fuzz missed
    once before), and bit-flipped valid files all return a dict or None,
    never raise or read out of bounds."""
    import random

    from kgmwcp.engine import media

    rng = random.Random(seed)
    base = media.make_bmp(9, 7, 3, seed=seed % 256) if seed % 2 else \
        media.make_wav(2, 8000, 33, seed=seed % 256)
    candidates = [
        data,
        base[: rng.randrange(len(base) + 1)],      # truncated carve
        bytes(data) + base,                         # garbage prefix
    ]
    corrupted = bytearray(base + data)
    for _ in range(8):
        corrupted[rng.randrange(len(corrupted))] ^= 1 << rng.randrange(8)
    candidates.append(bytes(corrupted))
    for fn in (media.resize_bmp_nearest, media.wav_features):
        for payload in candidates:
            out = fn(payload)
            assert out is None or isinstance(out, dict)
