"""Derive the packaged impact-style condensed face from DejaVu Sans Bold.

The reference ships Microsoft's proprietary ``fonts/impact.ttf``
(reference imaging/caption.py:6) which this package cannot redistribute.
Impact's defining look for meme captions is a very condensed, heavy
sans — so we derive one from the already-bundled DejaVu Sans Bold
(``imaging/fonts/default.ttf``):

- glyph outlines, advances and sidebearings condensed to CONDENSE x-scale
  (Impact's advance widths are ~70-75% of DejaVu Bold's at equal size);
- kerning dropped (``kern``/``GPOS``): pair values would need the same
  rescale, and Impact-style display setting is effectively unkerned —
  dropping beats misscaled pairs and keeps measurement simple;
- renamed to "DeepHumor Condensed": the Bitstream Vera license (see
  ``fonts/DEJAVU-LICENSE``) requires derivatives to drop the
  "Bitstream"/"Vera" names, and the DejaVu project asks the same for
  "DejaVu"; the license text itself must ship alongside, and does.

Output: ``deephumor_tpu/imaging/fonts/condensed.ttf`` — resolved by
``imaging.caption._FONT_CANDIDATES`` ahead of ``default.ttf`` so the
default meme render matches the reference's Impact look. Deterministic:
re-running on the same ``default.ttf`` reproduces the same bytes
(modification dates are pinned), so the golden tests stay stable.

Usage::

    python scripts/make_condensed_font.py [--condense 0.72] [--out PATH]
"""

import argparse
import os

from fontTools.ttLib import TTFont

PKG_FONTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "deephumor_tpu", "imaging", "fonts")

FAMILY = "DeepHumor Condensed"
SUBFAMILY = "Bold"
FULL = "DeepHumor Condensed Bold"
PS_NAME = "DeepHumorCondensed-Bold"
UNIQUE = "DeepHumorCondensed-Bold-1.0"
VERSION = "Version 1.0"
# keep the Bitstream/DejaVu copyright line (required) + state the change
COPYRIGHT = (
    "Copyright (c) 2003 by Bitstream, Inc. All Rights Reserved. "
    "Copyright (c) 2006 by Tavmjong Bah. All Rights Reserved. "
    "DejaVu changes are in public domain. DeepHumor Condensed is a "
    "horizontally-condensed derivative of DejaVu Sans Bold "
    "(deephumor_tpu, 2026); derivative changes are in the public domain."
)


def condense_font(src_path, out_path, condense=0.72):
    font = TTFont(src_path, recalcBBoxes=True, recalcTimestamp=False)

    def sx(v):
        return int(round(v * condense))

    # -- outlines ----------------------------------------------------------
    glyf = font["glyf"]
    for name in font.getGlyphOrder():
        g = glyf[name]
        if g.isComposite():
            # component x-offsets scale; the referenced base glyphs are
            # scaled once via their own (simple) outlines
            for comp in g.components:
                if hasattr(comp, "x"):
                    comp.x = sx(comp.x)
        elif g.numberOfContours > 0:
            coords = g.coordinates
            for i, (x, y) in enumerate(coords):
                coords[i] = (sx(x), y)

    # -- horizontal metrics --------------------------------------------------
    hmtx = font["hmtx"]
    for name in font.getGlyphOrder():
        adv, lsb = hmtx[name]
        hmtx[name] = (sx(adv), sx(lsb))

    # kerning: drop rather than misscale (module docstring)
    for tag in ("kern", "GPOS"):
        if tag in font:
            del font[tag]

    if "OS/2" in font:
        os2 = font["OS/2"]
        os2.xAvgCharWidth = sx(os2.xAvgCharWidth)
        # usWidthClass 3 = condensed (75%)
        os2.usWidthClass = 3

    # -- identity ------------------------------------------------------------
    name_table = font["name"]
    new_names = {
        0: COPYRIGHT, 1: FAMILY, 2: SUBFAMILY, 3: UNIQUE, 4: FULL,
        5: VERSION, 6: PS_NAME,
        # 8 (manufacturer), 9 (designer) inherited from the source font
    }
    for rec in list(name_table.names):
        if rec.nameID in new_names:
            name_table.setName(new_names[rec.nameID], rec.nameID,
                               rec.platformID, rec.platEncID, rec.langID)
        elif rec.nameID in (16, 17):  # typographic family/subfamily
            name_table.removeNames(nameID=rec.nameID,
                                   platformID=rec.platformID,
                                   platEncID=rec.platEncID,
                                   langID=rec.langID)

    # pin dates so regeneration is byte-stable
    head = font["head"]
    head.created = head.modified = 3507082800  # 2015-02-28, arbitrary fixed

    font.save(out_path)
    return out_path


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--condense", type=float, default=0.72)
    ap.add_argument("--src", default=os.path.join(PKG_FONTS, "default.ttf"))
    ap.add_argument("--out", default=os.path.join(PKG_FONTS, "condensed.ttf"))
    args = ap.parse_args(argv)
    out = condense_font(args.src, args.out, args.condense)
    print(f"wrote {out} ({os.path.getsize(out)} bytes, "
          f"condense={args.condense})")


if __name__ == "__main__":
    main()
