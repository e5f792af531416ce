"""Tests for the meme caption renderer."""

import os

import numpy as np
import pytest
from PIL import Image

from deephumor_tpu.imaging import (
    caption_image,
    default_font_path,
    get_maximal_font,
    memeify_image,
    split_to_lines,
)


@pytest.fixture
def img():
    # mid-gray canvas so both black border and white fill change pixels
    return Image.new("RGB", (400, 300), (128, 128, 128))


def test_default_font_resolves():
    assert default_font_path()


def test_memeify_returns_new_image(img):
    out = memeify_image(img, top="hello", bottom="world")
    assert out is not img
    # original untouched
    assert np.asarray(img).std() == 0


def test_memeify_draws_black_and_white(img):
    out = np.asarray(memeify_image(img, top="top text", bottom="bottom text"))
    flat = out.reshape(-1, 3)
    assert (flat == 255).all(axis=1).any(), "white fill missing"
    assert (flat == 0).all(axis=1).any(), "black border missing"


def test_memeify_top_vs_bottom_position(img):
    top_only = np.asarray(memeify_image(img, top="aaaa"))
    bot_only = np.asarray(memeify_image(img, bottom="aaaa"))
    h = img.height
    # top text paints the upper half only; bottom text the lower half only
    assert (top_only[: h // 2] != 128).any()
    assert (top_only[h // 2 :] == 128).all()
    assert (bot_only[h // 2 :] != 128).any()
    assert (bot_only[: h // 2] == 128).all()


def test_memeify_deterministic(img):
    a = np.asarray(memeify_image(img, top="same text", bottom="every time"))
    b = np.asarray(memeify_image(img, top="same text", bottom="every time"))
    assert (a == b).all()


def test_split_to_lines_short_text_single_line(img):
    font = get_maximal_font(img, "G" * 20, font_size=int(img.height / 5.4))
    lines = split_to_lines(img, "short", font)
    assert lines == ["SHORT"]


def test_split_to_lines_wraps_long_text_preserving_words(img):
    font = get_maximal_font(img, "G" * 20, font_size=int(img.height / 5.4))
    text = "this is a rather long caption that must wrap onto lines"
    lines = split_to_lines(img, text, font)
    assert len(lines) > 1
    # no word split in half: rejoining with spaces gives the original words
    rejoined = " ".join(" ".join(lines).split())
    assert rejoined == text.upper()


def test_get_maximal_font_fits_width(img):
    font = get_maximal_font(img, "WWWWWWWWWW", font_size=100)
    left, top, right, bottom = font.getbbox("WWWWWWWWWW")
    assert right <= img.width * 0.94


def test_caption_image_uppercases(img):
    # lowercase input renders: split_to_lines uppercases
    lines = split_to_lines(img, "lower", get_maximal_font(img, "GGGGG", 40))
    assert lines == ["LOWER"]
    out = caption_image(img.copy(), lines, get_maximal_font(img, "GGGGG", 40))
    assert (np.asarray(out) != 128).any()


def test_golden_render():
    """Pixel-exact golden render (SURVEY §4) against the PACKAGED font
    (deephumor_tpu/imaging/fonts/default.ttf) — host-font independent."""
    import os

    from deephumor_tpu.imaging.caption import packaged_font_path

    golden_path = os.path.join(
        os.path.dirname(__file__), "golden", "meme_320x240.png"
    )
    golden = np.asarray(Image.open(golden_path))
    img = Image.new("RGB", (320, 240), (120, 100, 80))
    out = np.asarray(
        memeify_image(img, top="one does not simply",
                      bottom="render a golden meme",
                      font_path=packaged_font_path())
    )
    np.testing.assert_array_equal(out, golden)


def test_golden_render_grid_border():
    """The reference's offset-grid border mode, pixel-exact golden
    (packaged font)."""
    import os

    from deephumor_tpu.imaging.caption import packaged_font_path

    golden_path = os.path.join(
        os.path.dirname(__file__), "golden", "meme_320x240_grid.png"
    )
    golden = np.asarray(Image.open(golden_path))
    img = Image.new("RGB", (320, 240), (120, 100, 80))
    out = np.asarray(
        memeify_image(img, top="one does not simply",
                      bottom="render a golden meme", border="grid",
                      font_path=packaged_font_path())
    )
    np.testing.assert_array_equal(out, golden)


def test_dilate_fill_placement_matches_draw_text():
    """The dilate border mode's WHITE FILL must land pixel-identically to
    ImageDraw.text (same int/fract coordinate split, same subpixel start
    into the rasterizer) — the border is the only thing that differs
    from the stroke mode."""
    from PIL import ImageDraw, ImageFont

    from deephumor_tpu.imaging.caption import (
        _draw_dilate_bordered,
        packaged_font_path,
    )

    font = ImageFont.truetype(packaged_font_path(), 41)
    for xy in [(13.7, 50.2), (0.0, 0.0), (199.5, 120.9)]:
        a = Image.new("RGB", (400, 300), (40, 80, 120))
        ImageDraw.Draw(a).text(xy, "HELLO WORLD", (255, 255, 255),
                               font=font)
        b = Image.new("RGB", (400, 300), (40, 80, 120))
        _draw_dilate_bordered(b, xy, "HELLO WORLD", font, 0)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dilate_border_surrounds_fill():
    """Border mode sanity: no white glyph pixel touches raw background
    directly — the dilated black ring sits between them. Background is a
    NON-gray color: white-over-black antialiasing only produces grays,
    so an exact bg match can't be a glyph edge pixel."""
    img = Image.new("RGB", (400, 300), (40, 80, 120))
    out = np.asarray(memeify_image(img, top="BORDER", bottom=""))
    white = (out == 255).all(axis=2)
    black = (out == 0).all(axis=2)
    assert white.any() and black.any()
    ys, xs = np.nonzero(white)
    bg = (out == np.array([40, 80, 120])).all(axis=2)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            assert not bg[
                np.clip(ys + dy, 0, out.shape[0] - 1),
                np.clip(xs + dx, 0, out.shape[1] - 1),
            ].any()


def test_glyph_compose_matches_whole_line_raster():
    """The glyph-compose fast path (per-glyph rasters blitted at
    kern-cached pen positions) must produce renders pixel-identical to
    whole-line ``getmask2`` rasterization — across kerned pairs, spaces,
    punctuation, subpixel phases, and font sizes."""
    import deephumor_tpu.imaging.caption as cap
    from deephumor_tpu.imaging.caption import (
        _draw_dilate_bordered, _load_font, packaged_font_path)

    cases = [
        ("AVATAR WAVY TEXT!", 41, (13.7, 50.2)),
        ("WHEN YOU REALIZE THE THING 42", 23, (0.0, 0.0)),
        ("W151 W2992 'QUOTES' ?!.", 33, (99.5, 20.25)),
        ("LTAVAWAY .,;:!?'\"", 17, (7.125, 3.875)),
    ]
    for text, size, xy in cases:
        font = _load_font(packaged_font_path(), size)  # compose-eligible
        assert cap._composer_for(font) is not None
        a = Image.new("RGB", (700, 300), (40, 80, 120))
        _draw_dilate_bordered(a, xy, text, font, 2)
        b = Image.new("RGB", (700, 300), (40, 80, 120))
        orig = cap._COMPOSE_SAFE
        cap._COMPOSE_SAFE = frozenset()  # force whole-line raster path
        try:
            _draw_dilate_bordered(b, xy, text, font, 2)
        finally:
            cap._COMPOSE_SAFE = orig
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_glyph_compose_fill_matches_draw_text():
    """Compose-path white fill lands pixel-identically to ImageDraw.text
    (the compose-eligible analogue of the raw-path placement test)."""
    from PIL import ImageDraw

    from deephumor_tpu.imaging.caption import (
        _draw_dilate_bordered, _load_font, packaged_font_path)

    font = _load_font(packaged_font_path(), 41)
    for xy in [(13.7, 50.2), (0.0, 0.0), (199.5, 120.9)]:
        a = Image.new("RGB", (400, 300), (40, 80, 120))
        ImageDraw.Draw(a).text(xy, "HELLO WORLD", (255, 255, 255),
                               font=font)
        b = Image.new("RGB", (400, 300), (40, 80, 120))
        _draw_dilate_bordered(b, xy, "HELLO WORLD", font, 0)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_non_ascii_takes_whole_line_path():
    """Lines with chars outside printable ASCII must render through the
    whole-line rasterizer (contextual shaping can differ per glyph) and
    still draw correctly."""
    img = Image.new("RGB", (400, 300), (40, 80, 120))
    out = np.asarray(memeify_image(img, top="CAFÉ MEMES", bottom=""))
    assert (out == 255).all(axis=2).any()


def test_glyph_compose_lowercase_and_ligature_pairs():
    """Lowercase text (potential fi/fl ligatures under HarfBuzz) must
    render pixel-identically to the whole-line rasterizer: pairs that
    don't shape decomposably are detected by the composer's per-pair
    self-validation and the line falls back."""
    import deephumor_tpu.imaging.caption as cap
    from deephumor_tpu.imaging.caption import (
        _draw_dilate_bordered, _load_font, packaged_font_path)

    font = _load_font(packaged_font_path(), 29)
    for text in ["finally fine flags", "off the waffle", "mixed Case fi"]:
        a = Image.new("RGB", (700, 300), (40, 80, 120))
        _draw_dilate_bordered(a, (10.5, 40.25), text, font, 2)
        b = Image.new("RGB", (700, 300), (40, 80, 120))
        orig = cap._COMPOSE_SAFE
        cap._COMPOSE_SAFE = frozenset()
        try:
            _draw_dilate_bordered(b, (10.5, 40.25), text, font, 2)
        finally:
            cap._COMPOSE_SAFE = orig
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_glyph_compose_unsafe_pair_detection():
    """A synthetic non-decomposable pair must be flagged unsafe and
    force the fallback (exercises the detection machinery even when the
    packaged font has no ligatures)."""
    import deephumor_tpu.imaging.caption as cap
    from deephumor_tpu.imaging.caption import _load_font, packaged_font_path

    font = _load_font(packaged_font_path(), 29)
    comp = cap._LineComposer(font)
    # sane pairs validate as safe
    assert comp._pair_safe("A", "V")
    assert comp.compose("AV", 0.0, 0.0) != "unsafe"
    # poison the cache to emulate a ligating pair
    comp._pair_ok[("A", "V")] = False
    assert comp.compose("AV", 0.0, 0.0) == "unsafe"
    assert comp.compose("HAVE", 0.0, 0.0) == "unsafe"
    assert comp.compose("HOME", 0.0, 0.0) != "unsafe"


def test_fast_measure_matches_getbbox():
    """The decomposed measurement learner (``_FastMeasure``) must return
    getbbox-exact (right, bottom) through every regime — learning
    (fallback+narrowing), active pinning, and the converged fast path —
    and must mostly stop calling the real ``getbbox`` once converged."""
    import string

    import deephumor_tpu.imaging.caption as cap
    from deephumor_tpu.imaging.caption import _load_font, packaged_font_path

    rng = np.random.default_rng(3)
    chars = string.ascii_uppercase + string.digits + " .,!?'\"-"
    for size in (13, 29, 41):
        font = _load_font(packaged_font_path(), size)
        meas = cap._FastMeasure(font, cap._composer_for(font))
        for _ in range(400):
            n = int(rng.integers(1, 26))
            s = "".join(chars[rng.integers(0, len(chars))] for _ in range(n))
            left, top, right, bottom = font.getbbox(s)
            assert meas.measure(s) == (right, bottom), (size, s)
        assert meas._enabled
        # converged: the residual real-getbbox rate must be low
        calls = 0
        real = type(font).getbbox

        def counting(self, *a, **k):
            nonlocal calls
            calls += 1
            return real(self, *a, **k)

        type(font).getbbox = counting
        try:
            for _ in range(200):
                n = int(rng.integers(1, 26))
                s = "".join(
                    chars[rng.integers(0, len(chars))] for _ in range(n))
                meas.measure(s)
        finally:
            type(font).getbbox = real
        assert calls < 40, calls


def test_fast_measure_disables_on_mismatch():
    """A validation-window mismatch permanently disables the fast path
    (the learner must fail safe, never emit a wrong width)."""
    import deephumor_tpu.imaging.caption as cap
    from deephumor_tpu.imaging.caption import _load_font, packaged_font_path

    font = _load_font(packaged_font_path(), 31)
    meas = cap._FastMeasure(font, cap._composer_for(font))
    meas.measure("HELLO WORLD")  # bootstrap some chars
    # poison a pinned interval to force a fast answer that cannot match
    for ch, iv in meas._xiv.items():
        iv[0] = iv[1] = iv[1] + 640
    meas._fallbacks = meas._PIN_AFTER
    got = meas.measure("HELLO WORLD")
    assert got == font.getbbox("HELLO WORLD")[2:]  # still exact (fallback)
    assert not meas._enabled

def test_word_compose_fuzz_matches_whole_line_raster():
    """The word-memoized compose path (composed word rasters cached by
    subpixel entry phase, blitted disjointly) must stay pixel-identical
    to whole-line rasterization — especially on REPEATED words, where
    the cache serves rasters composed at a different line position."""
    import deephumor_tpu.imaging.caption as cap
    from deephumor_tpu.imaging.caption import (
        _draw_dilate_bordered, _load_font, packaged_font_path)

    rng = np.random.default_rng(11)
    vocab = ["WHEN", "YOU", "A", "THE", "MEME", "W.", "!?", "'EM",
             "AVATAR", "1917", "L", "TAVAWAY"]
    for size in (19, 37):
        font = _load_font(packaged_font_path(), size)
        assert cap._composer_for(font) is not None
        for trial in range(12):
            k = int(rng.integers(1, 6))
            text = " ".join(vocab[rng.integers(0, len(vocab))]
                            for _ in range(k))
            xy = (float(rng.uniform(0, 30)), float(rng.uniform(0, 40)))
            a = Image.new("RGB", (900, 200), (40, 80, 120))
            _draw_dilate_bordered(a, xy, text, font, 2)
            b = Image.new("RGB", (900, 200), (40, 80, 120))
            orig = cap._COMPOSE_SAFE
            cap._COMPOSE_SAFE = frozenset()  # force whole-line raster
            try:
                _draw_dilate_bordered(b, xy, text, font, 2)
            finally:
                cap._COMPOSE_SAFE = orig
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b), err_msg=f"{size} {text!r}")


def test_word_compose_overlap_falls_back_exactly():
    """If two words' rasters would overlap across a space, the composer
    must redo the line glyph-by-glyph (blend order follows glyphs); the
    output must still equal the whole-line raster."""
    import deephumor_tpu.imaging.caption as cap
    from deephumor_tpu.imaging.caption import _load_font, packaged_font_path

    font = _load_font(packaged_font_path(), 33)
    comp = cap._composer_for(font)
    assert comp is not None
    got = comp.compose("AV AV", 0.25, 0.0)
    raw = comp._compose_raw("AV AV", 0.25, 0.0)
    if got != "unsafe":
        assert raw is not None
        arr_a, xa, ya = got
        arr_b, xb, yb = raw
        assert (xa, ya) == (xb, yb)
        np.testing.assert_array_equal(arr_a, arr_b)


_OTHER_FACES = [
    p for p in (
        "/usr/share/fonts/truetype/dejavu/DejaVuSerif-Bold.ttf",
        "/usr/share/fonts/truetype/dejavu/DejaVuSansMono.ttf",
        "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf",
    )
    if os.path.exists(p)
]


@pytest.mark.parametrize("face", _OTHER_FACES)
def test_compose_and_measure_parity_on_other_font_families(face):
    """The glyph/word-compose and learned-measurement machinery is
    self-validating per FACE (kern-pair safety, interval pinning, the
    32-answer validation window), so its exactness must hold on font
    families with different metrics than the packaged DejaVu Sans Bold —
    a serif face with different kerning tables and a monospace face with
    none. Skipped when the host lacks the standard DejaVu variants."""
    import deephumor_tpu.imaging.caption as cap
    from deephumor_tpu.imaging.caption import _draw_dilate_bordered, _load_font

    rng = np.random.default_rng(5)
    vocab = ["WHEN", "AVATAR", "1917", "W.", "!?", "'EM", "TO", "YA",
             "LTAV", "AWAY", "THE", "X-1"]
    for size in (17, 35):
        font = _load_font(face, size)
        # measurement parity through learning -> pinned regimes
        meas = cap._FastMeasure(font, cap._composer_for(font))
        for _ in range(250):
            k = int(rng.integers(1, 5))
            s = " ".join(vocab[rng.integers(0, len(vocab))]
                         for _ in range(k))
            assert meas.measure(s) == font.getbbox(s)[2:], (face, size, s)
        # NOT vacuous: a validation mismatch silently flips the learner
        # to plain getbbox (fail-safe), which would make the equality
        # above trivially true — the fast path must have stayed alive
        assert meas._enabled, (face, size)
        # and the compose path must actually decompose on this face
        # (pair-unsafe fonts would silently compare whole-line to
        # whole-line below)
        comp = cap._composer_for(font)
        assert comp.compose("AVATAR", 0.25, 0.0) != "unsafe", (face, size)

        # render parity: memoized compose path vs whole-line raster
        for _ in range(6):
            k = int(rng.integers(1, 5))
            text = " ".join(vocab[rng.integers(0, len(vocab))]
                            for _ in range(k))
            xy = (float(rng.uniform(0, 30)), float(rng.uniform(0, 40)))
            a = Image.new("RGB", (900, 200), (40, 80, 120))
            _draw_dilate_bordered(a, xy, text, font, 2)
            b = Image.new("RGB", (900, 200), (40, 80, 120))
            orig = cap._COMPOSE_SAFE
            cap._COMPOSE_SAFE = frozenset()  # force whole-line raster
            try:
                _draw_dilate_bordered(b, xy, text, font, 2)
            finally:
                cap._COMPOSE_SAFE = orig
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b),
                err_msg=f"{face} {size} {text!r}")


def test_threaded_render_matches_sequential():
    """memeify_image must be thread-safe: the pipeline renders on a
    thread pool sharing the composer/measurer caches, whose multi-step
    updates need the per-face lock. Renders from 8 concurrent threads
    must be pixel-identical to sequential renders of the same captions
    (and must not crash on the registries' evict/move-to-end paths)."""
    import random
    from concurrent.futures import ThreadPoolExecutor

    random.seed(21)
    vocab = ["WHEN", "YOU", "SEE", "AVATAR", "1917", "THE", "MEME",
             "W.", "!?", "LTAV", "AWAY", "ME"]
    base = Image.new("RGB", (380, 260), (70, 90, 110))
    caps = []
    for _ in range(48):
        k = random.randint(2, 9)
        caps.append((" ".join(random.choices(vocab, k=k)),
                     " ".join(random.choices(vocab, k=random.randint(0, 4)))))

    with ThreadPoolExecutor(8) as pool:
        threaded = list(pool.map(
            lambda tb: np.asarray(memeify_image(base, top=tb[0],
                                                bottom=tb[1])), caps))
    for (top, bottom), got in zip(caps, threaded):
        want = np.asarray(memeify_image(base, top=top, bottom=bottom))
        np.testing.assert_array_equal(got, want, err_msg=f"{top!r}|{bottom!r}")


def test_golden_render_condensed():
    """Pixel-exact golden against the packaged impact-style face
    (fonts/condensed.ttf, built by scripts/make_condensed_font.py) —
    the default meme look matching the reference's Impact
    (reference imaging/caption.py:6 loads fonts/impact.ttf)."""
    import os

    from deephumor_tpu.imaging.caption import condensed_font_path

    golden_path = os.path.join(
        os.path.dirname(__file__), "golden", "meme_320x240_condensed.png"
    )
    golden = np.asarray(Image.open(golden_path))
    img = Image.new("RGB", (320, 240), (120, 100, 80))
    out = np.asarray(
        memeify_image(img, top="one does not simply",
                      bottom="render a golden meme",
                      font_path=condensed_font_path())
    )
    np.testing.assert_array_equal(out, golden)


def test_condensed_is_default_and_condensed():
    """Without a real impact.ttf installed, default resolution picks the
    condensed face, and its advances are genuinely narrower than the
    unmodified DejaVu Bold (impact-style fit: more/larger text per
    line)."""
    from PIL import ImageFont

    from deephumor_tpu.imaging.caption import (
        condensed_font_path,
        packaged_font_path,
    )

    resolved = default_font_path()
    if "impact" in os.path.basename(resolved).lower():
        pytest.skip("a real impact.ttf shadows the packaged face")
    assert resolved == condensed_font_path()
    s = "WHEN YOU SHIP IT"
    w_cond = ImageFont.truetype(condensed_font_path(), 48).getbbox(s)[2]
    w_full = ImageFont.truetype(packaged_font_path(), 48).getbbox(s)[2]
    assert w_cond < 0.8 * w_full, (w_cond, w_full)


def test_condensed_font_regenerates_byte_stable(tmp_path):
    """scripts/make_condensed_font.py is deterministic: regenerating from
    the bundled default.ttf reproduces the committed bytes exactly (so
    the golden stays pinned and the build is auditable)."""
    pytest.importorskip("fontTools")
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    try:
        from make_condensed_font import condense_font
    finally:
        sys.path.pop(0)

    from deephumor_tpu.imaging.caption import (
        condensed_font_path,
        packaged_font_path,
    )

    out = tmp_path / "regen.ttf"
    condense_font(packaged_font_path(), str(out))
    with open(condensed_font_path(), "rb") as f:
        committed = f.read()
    assert out.read_bytes() == committed
