"""Deterministic minimal PDF writer for tests and synthetic corpora.

Produces valid PDF 1.4 bytes (header, numbered objects, FlateDecode
content streams, image XObjects, xref table with correct offsets,
trailer) from a declarative page spec, so the PDF layout parser
(core/pdfparse.py) can be exercised against documents whose expected
span sequence is known by construction — the expectations in
tests/test_pdfparse.py are handwritten, not derived from the parser.

No third-party dependency: zlib is stdlib.  Everything is a pure
function of its arguments (north-rule determinism: resumable re-runs
must produce identical snapshots).
"""

from __future__ import annotations

import base64
import zlib

__all__ = [
    "build_pdf", "synth_pdf", "synth_link_pdf", "synth_two_column_pdf",
    "synth_rotated_pdf", "synth_cid_pdf", "synth_inline_pdf",
    "assign_glyph_codes", "cid_glyph_width", "CID_DW",
]

CID_DW = 600.0


def cid_glyph_width(code: int) -> float:
    """Deterministic per-CID width (1/1000 em) for ``cid_widths`` fonts.

    Shared by build_pdf's /W emission and synth_cid_pdf's construction-
    time pen arithmetic so the expectation never re-derives from the
    parser.  The LAST assigned code is deliberately left out of /W and
    falls to /DW — synth callers must apply the same last-code rule."""
    return 350.0 + (code % 5) * 75.0


def assign_glyph_codes(strings) -> dict[str, int]:
    """The ``cmap_fonts`` glyph-code assignment: sorted distinct chars
    over all shown strings -> 0x0100 + index.

    ONE definition shared by build_pdf's CMap/W emission and the synth
    generators' construction-time pen arithmetic — two copies of this
    rule would let a build_pdf change silently desynchronize the
    expected-span math."""
    chars = sorted({ch for s in strings for ch in s})
    return {ch: 0x0100 + i for i, ch in enumerate(chars)}


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def build_pdf(
    pages: list[list[tuple]],
    compress: bool = True,
    ascii85: bool = False,
    objstm: bool = False,
    cmap_fonts: bool = False,
    cid_widths: bool = False,
    nested_pages: bool = False,
    xref_stream: bool = False,
    indirect_length: bool = False,
    indirect_annots: bool = False,
    widths_font: bool = False,
    descriptor_font: bool = False,
    hoist_resources: bool = False,
) -> bytes:
    """Build a PDF from page specs.

    Each page is a list of ops:

    * ``("text", x, y, size, "string")`` — one positioned text run
    * ``("text_spaced", x, y, size, "string", tc, tw)`` — a run with
      Tc character / Tw word spacing set before the show
    * ``("tj", x, y, size, ["a", -300, "b"])`` — a TJ array with
      kerning adjustments (thousandths; <= -180 reads as a space)
    * ``("image", x, y, raw_bytes)`` — an RGB image XObject stub
    * ``("inline_image", x, y, raw_bytes)`` — a BI/ID/EI inline image
      (ISO 32000 §8.9.7): raw sample bytes embedded directly in the
      content stream, the layout scanned documents and label printers
      emit for small images
    * ``("link", x, y, w, h, uri)`` — a /Annots Link annotation with a
      /A URI action covering the given rectangle
    * ``("rect", x, y, w, h)`` — a stroked ``re`` rectangle path
    * ``("line", x0, y0, x1, y1)`` — a stroked ``m``/``l`` segment
      (rect + line are the two path forms ruled-table grids are drawn
      with)

    ``ascii85=True`` encodes content streams as
    ``/Filter [/ASCII85Decode /FlateDecode]`` (base-85 text armor over
    deflate, applied in decode order) — the chain mail-gateway-safe
    producers emit.

    ``nested_pages=True`` builds a balanced page TREE (intermediate
    /Pages nodes with two kids each, the layout real multi-page
    producers emit) instead of one flat /Kids array.

    ``xref_stream=True`` replaces the classic xref table + trailer with
    a PDF 1.5 cross-reference STREAM (/Type /XRef, W [1 4 2] binary
    entries, trailer keys in the stream dict) — the layout of modern
    producers, where a parser that insists on a classic ``xref`` keyword
    finds none.

    ``indirect_length=True`` writes every content stream's /Length as an
    indirect reference to a plain-integer object (``N 0 R``), the form
    streaming writers emit because the byte count is unknown until the
    stream is written.

    ``objstm=True`` packs every dict-only object (catalog, pages node,
    page dicts, fonts) into a PDF 1.5 compressed object stream —
    the layout modern producers emit, where page structure is invisible
    to a plain body scan until the ObjStm is unpacked.  (The xref table
    keeps placeholder entries for packed objects rather than a full
    xref stream; stream-bearing objects stay at top level, per spec.)

    ``cmap_fonts=True`` emits text as 2-byte glyph codes through a
    subset-style Type0 font with a /ToUnicode CMap (Identity-H layout)
    — the dominant encoding of modern producers, where show-strings are
    meaningless without the CMap.  Code assignment is deterministic
    (0x0100 + sorted index of the character).
    """
    objects: list[bytes] = []  # bodies, object number = index + 1

    def add(body: bytes) -> int:
        objects.append(body)
        return len(objects)

    if cid_widths and not cmap_fonts:
        # /W hangs off the Type0 font's /DescendantFonts CIDFont — it
        # has no meaning for a simple font; failing loudly beats handing
        # the caller a widthless layout they believe carries metrics
        raise ValueError("cid_widths requires cmap_fonts")
    if descriptor_font and (widths_font or cmap_fonts):
        raise ValueError(
            "descriptor_font is mutually exclusive with widths_font/"
            "cmap_fonts"
        )
    if widths_font and cmap_fonts:
        # the CMap layout is a Type0 font without the /Widths table;
        # silently ignoring one flag would hand a caller the half-em
        # estimate while they believe they pinned width-accurate metrics
        raise ValueError(
            "widths_font and cmap_fonts are mutually exclusive"
        )
    font_num = None
    page_nums = []
    length_nums: set[int] = set()
    pages_num_placeholder = add(b"")  # /Pages node, patched at the end

    glyph_code: dict[str, int] = {}
    if cmap_fonts:
        glyph_code = assign_glyph_codes(
            el
            for page in pages
            for op in page
            # every op whose payload routes through _enc: plain
            # and Tc/Tw-spaced runs carry one string at op[4], TJ
            # carries a string/number array there
            if op[0] in ("text", "text_spaced", "text_rot", "tj")
            for el in (op[4] if op[0] == "tj" else [op[4]])
            if isinstance(el, str)
        )
        bfchars = "".join(
            f"<{code:04X}> <{ord(ch):04X}>\n"
            for ch, code in glyph_code.items()
        ).encode("ascii")
        cmap_stream = (
            b"/CIDInit /ProcSet findresource begin\nbegincmap\n"
            b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
            + str(len(glyph_code)).encode() + b" beginbfchar\n"
            + bfchars + b"endbfchar\nendcmap\nend\n"
        )
        tounicode_num = add(
            b"<< /Length " + str(len(cmap_stream)).encode()
            + b" >>\nstream\n" + cmap_stream + b"\nendstream"
        )
        desc_ref = b""
        if cid_widths and glyph_code:
            # CIDFontType2 descendant with /W in the consecutive-list
            # form (codes ARE consecutive by construction: 0x0100+i).
            # The LAST code is left out of /W and falls to /DW — the
            # corpus exercises both lookup paths on every document.
            codes = sorted(glyph_code.values())
            listed = codes[:-1]
            w_body = b""
            if listed:
                w_body = (
                    b" /W [ " + str(listed[0]).encode() + b" [ "
                    + " ".join(
                        f"{cid_glyph_width(c):g}" for c in listed
                    ).encode()
                    + b" ] ]"
                )
            cidfont_num = add(
                b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont"
                b" /SyntheticSubset /CIDSystemInfo << /Registry (Adobe)"
                b" /Ordering (Identity) /Supplement 0 >> /DW "
                + f"{CID_DW:g}".encode() + w_body + b" >>"
            )
            desc_ref = (
                b" /DescendantFonts [" + str(cidfont_num).encode()
                + b" 0 R]"
            )
        font_num = add(
            b"<< /Type /Font /Subtype /Type0 /BaseFont /SyntheticSubset"
            b" /Encoding /Identity-H /ToUnicode "
            + str(tounicode_num).encode() + b" 0 R" + desc_ref + b" >>"
        )

    def _enc(s: str) -> str:
        if not cmap_fonts:
            return f"({_esc(s)})"
        return "<" + "".join(f"{glyph_code[ch]:04X}" for ch in s) + ">"

    for page in pages:
        content_parts: list[bytes] = []
        xobjects: dict[str, int] = {}
        annot_nums: list[int] = []
        for op in page:
            if op[0] == "text":
                _, x, y, size, s = op
                content_parts.append(
                    f"BT /F1 {size:g} Tf {x:g} {y:g} Td {_enc(s)} Tj ET"
                    .encode("latin-1")
                )
            elif op[0] == "text_spaced":
                _, x, y, size, s, tcv, twv = op
                content_parts.append(
                    f"BT /F1 {size:g} Tf {tcv:g} Tc {twv:g} Tw "
                    f"{x:g} {y:g} Td {_enc(s)} Tj ET".encode("latin-1")
                )
            elif op[0] == "text_rot":
                # axis-aligned rotated run via the full Tm matrix:
                # 90deg = [0 1 -1 0] (baseline flows up the page),
                # 270deg = [0 -1 1 0] (flows down) — the layouts real
                # producers emit for margin labels / vertical captions
                _, x, y, size, s, quad = op
                mat = "0 1 -1 0" if quad == 90 else "0 -1 1 0"
                content_parts.append(
                    f"BT /F1 {size:g} Tf {mat} {x:g} {y:g} Tm "
                    f"{_enc(s)} Tj ET".encode("latin-1")
                )
            elif op[0] == "tj":
                _, x, y, size, arr = op
                items = "".join(
                    f"{_enc(el)} " if isinstance(el, str) else f"{el:g} "
                    for el in arr
                )
                content_parts.append(
                    f"BT /F1 {size:g} Tf {x:g} {y:g} Td [{items}] TJ ET"
                    .encode("latin-1")
                )
            elif op[0] == "rect":
                # stroked rectangle path — the outer-border form table
                # producers emit (a thin one reads as a single rule)
                _, x, y, w, h = op
                content_parts.append(
                    f"{x:g} {y:g} {w:g} {h:g} re S".encode("latin-1")
                )
            elif op[0] == "line":
                # stroked m/l segment — the inner-rule form
                _, x0, y0, x1, y1 = op
                content_parts.append(
                    f"{x0:g} {y0:g} m {x1:g} {y1:g} l S".encode("latin-1")
                )
            elif op[0] == "link":
                _, x, y, w, h, uri = op
                annot_nums.append(
                    add(
                        f"<< /Type /Annot /Subtype /Link /Rect"
                        f" [{x:g} {y:g} {x + w:g} {y + h:g}]"
                        f" /A << /S /URI /URI ({_esc(uri)}) >> >>"
                        .encode("latin-1")
                    )
                )
            elif op[0] == "inline_image":
                # raw sample bytes straight in the content stream; data
                # runs from the byte after ID's single whitespace to the
                # byte before EI's preceding whitespace
                _, x, y, raw = op
                content_parts.append(
                    f"q 1 0 0 1 {x:g} {y:g} cm BI /W 2 /H 2"
                    f" /CS /DeviceRGB /BPC 8 ID\n".encode("latin-1")
                    + raw + b"\nEI Q"
                )
            elif op[0] == "image":
                _, x, y, raw = op
                img_stream = zlib.compress(raw, 6)
                img_num = add(
                    b"<< /Type /XObject /Subtype /Image /Width 4 /Height 4"
                    b" /ColorSpace /DeviceRGB /BitsPerComponent 8"
                    b" /Filter /FlateDecode /Length "
                    + str(len(img_stream)).encode()
                    + b" >>\nstream\n" + img_stream + b"\nendstream"
                )
                name = f"Im{img_num}"
                xobjects[name] = img_num
                content_parts.append(
                    f"q 1 0 0 1 {x:g} {y:g} cm /{name} Do Q".encode("latin-1")
                )
        raw_content = b"\n".join(content_parts)
        if ascii85:
            # decode order is as listed: ASCII85 first, then Flate —
            # so the encoder deflates, then text-armors
            data = base64.a85encode(zlib.compress(raw_content, 6)) + b"~>"
            filt = b" /Filter [/ASCII85Decode /FlateDecode]"
        elif compress:
            data = zlib.compress(raw_content, 6)
            filt = b" /Filter /FlateDecode"
        else:
            data, filt = raw_content, b""
        if indirect_length:
            len_num = add(str(len(data)).encode())
            length_nums.add(len_num)
            content_num = add(
                b"<< /Length " + str(len_num).encode() + b" 0 R" + filt
                + b" >>\nstream\n" + data + b"\nendstream"
            )
        else:
            content_num = add(
                b"<< /Length " + str(len(data)).encode() + filt
                + b" >>\nstream\n" + data + b"\nendstream"
            )
        if font_num is None:
            if descriptor_font:
                # Type1 with a PARTIAL /Widths table (lowercase letters
                # only) + a /FontDescriptor whose /MissingWidth covers
                # everything else — the layout subset-embedded fonts
                # emit, where the parser must fall back per glyph
                fd_num = add(
                    b"<< /Type /FontDescriptor /FontName /Helvetica"
                    b" /Flags 32 /MissingWidth 600 >>"
                )
                ws = []
                for code in range(97, 123):  # 'a'..'z'
                    ws.append(400)
                font_num = add(
                    b"<< /Type /Font /Subtype /TrueType /BaseFont"
                    b" /Helvetica /FirstChar 97 /LastChar 122 /Widths ["
                    + " ".join(str(w) for w in ws).encode()
                    + b"] /FontDescriptor "
                    + str(fd_num).encode() + b" 0 R >>"
                )
            elif widths_font:
                # real per-glyph metrics (1/1000 em): 'i' wide to make
                # width-accurate advances observably different from the
                # half-em estimate; space narrow, everything else 500
                ws = []
                for code in range(32, 127):
                    ch = chr(code)
                    ws.append(
                        1000 if ch == "i" else (250 if ch == " " else 500)
                    )
                font_num = add(
                    b"<< /Type /Font /Subtype /Type1 /BaseFont"
                    b" /Helvetica /FirstChar 32 /LastChar 126 /Widths ["
                    + " ".join(str(w) for w in ws).encode()
                    + b"] >>"
                )
            else:
                font_num = add(
                    b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
                )
        xobj = b""
        if xobjects:
            refs = b" ".join(
                f"/{name} {num} 0 R".encode() for name, num in xobjects.items()
            )
            xobj = b" /XObject << " + refs + b" >>"
        annots = b""
        if annot_nums:
            arefs = b" ".join(
                str(n).encode() + b" 0 R" for n in annot_nums
            )
            if indirect_annots:
                # the array itself as its own numbered object
                # ("/Annots 9 0 R" -> "9 0 obj [ ... ] endobj")
                arr_num = add(b"[" + arefs + b"]")
                annots = b" /Annots " + str(arr_num).encode() + b" 0 R"
            else:
                annots = b" /Annots [" + arefs + b"]"
        if hoist_resources and not xobjects:
            # leaf declares NO /Resources: the parser must inherit the
            # ancestor /Pages node's dict (ISO 32000 §7.7.3.4)
            res_entry = b""
        else:
            res_entry = (
                b" /Resources << /Font << /F1 "
                + str(font_num).encode() + b" 0 R >>" + xobj + b" >>"
            )
        page_nums.append(
            add(
                b"<< /Type /Page /Parent "
                + str(pages_num_placeholder).encode()
                + b" 0 R /MediaBox [0 0 612 792]" + res_entry
                + b" /Contents " + str(content_num).encode() + b" 0 R"
                + annots + b" >>"
            )
        )

    hoisted = b""
    if hoist_resources:
        hoisted = (
            b" /Resources << /Font << /F1 "
            + str(font_num).encode() + b" 0 R >> >>"
        )
    if nested_pages and len(page_nums) > 1:
        # balanced two-level page tree: root /Pages -> two intermediate
        # /Pages nodes -> leaf pages (the shape real producers emit);
        # hoisted /Resources sit on the INTERMEDIATE nodes
        half = (len(page_nums) + 1) // 2
        mids = []
        for group in (page_nums[:half], page_nums[half:]):
            if not group:
                continue
            gkids = b" ".join(str(n).encode() + b" 0 R" for n in group)
            mid = add(
                b"<< /Type /Pages /Parent "
                + str(pages_num_placeholder).encode()
                + b" 0 R /Kids [" + gkids + b"] /Count "
                + str(len(group)).encode() + hoisted + b" >>"
            )
            mids.append(mid)
            # re-point each leaf's /Parent at its IMMEDIATE parent
            # (ISO 32000-1 §7.7.3.3): a leaf naming the root would
            # break /Parent-chain resource inheritance in readers that
            # walk leaf->root instead of top-down /Kids
            root_ref = (
                b"/Parent " + str(pages_num_placeholder).encode() + b" 0 R"
            )
            mid_ref = b"/Parent " + str(mid).encode() + b" 0 R"
            for n in group:
                objects[n - 1] = objects[n - 1].replace(root_ref, mid_ref, 1)
        kids = b" ".join(str(n).encode() + b" 0 R" for n in mids)
        root_res = b""
    else:
        kids = b" ".join(str(n).encode() + b" 0 R" for n in page_nums)
        root_res = hoisted
    objects[pages_num_placeholder - 1] = (
        b"<< /Type /Pages /Kids [" + kids + b"] /Count "
        + str(len(page_nums)).encode() + root_res + b" >>"
    )
    catalog_num = add(
        b"<< /Type /Catalog /Pages "
        + str(pages_num_placeholder).encode() + b" 0 R >>"
    )

    packed: dict[int, bytes] = {}
    objstm_num = None
    if objstm:
        # dict-only objects move into one compressed object stream;
        # stream-bearing objects (contents, images) stay at top level,
        # and so do the indirect /Length integers — ISO 32000-1 §7.5.7
        # forbids an object representing a stream's /Length inside an
        # object stream (a reader must resolve the length BEFORE it can
        # unpack any ObjStm)
        for i, body in enumerate(objects, start=1):
            if b"stream" not in body and i not in length_nums:
                packed[i] = body
        if packed:
            bodies = b""
            head = b""
            for num, body in packed.items():
                head += f"{num} {len(bodies)} ".encode()
                bodies += body + b"\n"
            first = len(head)
            payload = zlib.compress(head + bodies, 6)
            objects.append(
                b"<< /Type /ObjStm /N " + str(len(packed)).encode()
                + b" /First " + str(first).encode()
                + b" /Filter /FlateDecode /Length "
                + str(len(payload)).encode()
                + b" >>\nstream\n" + payload + b"\nendstream"
            )
            objstm_num = len(objects)

    out = bytearray(
        b"%PDF-1.5\n" if (objstm or xref_stream) else b"%PDF-1.4\n"
    )
    offsets = []
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        if i in packed:
            offsets[-1] = 0  # placeholder: object lives in the ObjStm
            continue
        out += str(i).encode() + b" 0 obj\n" + body + b"\nendobj\n"
    xref_off = len(out)

    if xref_stream:
        # PDF 1.5 cross-reference STREAM: /Type /XRef object carrying
        # W [1 4 2] big-endian entry rows (type, offset-or-objstm,
        # index) and the trailer keys in its own dict; no classic
        # `xref` keyword or `trailer` appears in the file at all.
        xnum = len(objects) + 1
        packed_index = {num: i for i, num in enumerate(packed)}
        rows = [b"\x00" + (0).to_bytes(4, "big") + (65535).to_bytes(2, "big")]
        for i, off in enumerate(offsets, start=1):
            if i in packed:
                rows.append(
                    b"\x02"
                    + (objstm_num or 0).to_bytes(4, "big")
                    + packed_index[i].to_bytes(2, "big")
                )
            else:
                rows.append(
                    b"\x01" + off.to_bytes(4, "big") + (0).to_bytes(2, "big")
                )
        rows.append(
            b"\x01" + xref_off.to_bytes(4, "big") + (0).to_bytes(2, "big")
        )
        payload = zlib.compress(b"".join(rows), 6)
        out += (
            str(xnum).encode() + b" 0 obj\n<< /Type /XRef /Size "
            + str(xnum + 1).encode() + b" /W [1 4 2] /Root "
            + str(catalog_num).encode() + b" 0 R /Filter /FlateDecode"
            b" /Length " + str(len(payload)).encode()
            + b" >>\nstream\n" + payload + b"\nendstream\nendobj\n"
        )
        out += b"startxref\n" + str(xref_off).encode() + b"\n%%EOF\n"
        return bytes(out)

    out += b"xref\n0 " + str(len(objects) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size " + str(len(objects) + 1).encode()
        + b" /Root " + str(catalog_num).encode() + b" 0 R >>\n"
        b"startxref\n" + str(xref_off).encode() + b"\n%%EOF\n"
    )
    return bytes(out)


_WORDS = (
    "analytics engine span layout parse shuffle broadcast partition "
    "column corpus heading stream batch vector token cluster page"
).split()


def synth_pdf(
    seed: int,
    objstm: bool = False,
    cmap_fonts: bool = False,
    nested_pages: bool = False,
    xref_stream: bool = False,
    indirect_length: bool = False,
    descriptor_font: bool = False,
) -> tuple[bytes, list[tuple[str, str | None]]]:
    """Deterministic synthetic PDF + its expected (kind, text/media) list.

    Pure function of ``seed`` (no RNG state): page/line counts and words
    are arithmetic in the seed, so a corpus regenerates identically —
    and the expected span sequence is constructed alongside the bytes,
    independent of the parser.
    """
    n_pages = 1 + seed % 3
    expected: list[tuple[str, str | None]] = []
    pages = []
    import hashlib

    for p in range(n_pages):
        ops: list[tuple] = []
        title = f"Section {seed}-{p}"
        ops.append(("text", 72, 740, 24, title))
        expected.append(("heading", title))
        n_lines = 2 + (seed + p) % 4
        y = 700
        for li in range(n_lines):
            words = [
                _WORDS[(seed * 7 + p * 5 + li * 3 + w) % len(_WORDS)]
                for w in range(6)
            ]
            line = " ".join(words)
            ops.append(("text", 72, y, 11, line))
            expected.append(("text", line))
            y -= 16
        if (seed + p) % 2 == 0:
            raw = bytes(
                ((seed * 31 + p * 17 + i) % 256) for i in range(48)
            )
            ops.append(("image", 72, y - 60, raw))
            # the parser hashes DECODED stream bytes (content address is
            # filter-independent)
            expected.append(("image", f"pdfimg:{hashlib.sha1(raw).hexdigest()}"))
        pages.append(ops)
    return (
        build_pdf(
            pages,
            objstm=objstm,
            cmap_fonts=cmap_fonts,
            nested_pages=nested_pages,
            xref_stream=xref_stream,
            indirect_length=indirect_length,
            descriptor_font=descriptor_font,
        ),
        expected,
    )


def synth_link_pdf(
    seed: int,
) -> tuple[bytes, list[tuple[str, str | None]]]:
    """Deterministic page with URI link annotations + expected spans.

    One heading, a few body lines, then 1-2 /Annots Link rectangles
    below them — the expected order interleaves by the links' /Rect
    top-left corners, constructed alongside the bytes.
    """
    n_lines = 2 + seed % 3
    n_links = 1 + seed % 2
    title = f"Linked {seed}"
    ops: list[tuple] = [("text", 72, 740, 24, title)]
    expected: list[tuple[str, str | None]] = [("heading", title)]
    y = 700
    for li in range(n_lines):
        line = " ".join(
            _WORDS[(seed * 9 + li * 5 + w) % len(_WORDS)] for w in range(5)
        )
        ops.append(("text", 72, y, 11, line))
        expected.append(("text", line))
        y -= 16
    for k in range(n_links):
        uri = f"https://example.com/doc{seed}/ref{k}"
        # rect top edge sits below every text baseline emitted above
        ops.append(("link", 72, y - 24 - 20 * k, 180, 14, uri))
        expected.append(("link", uri))
    return build_pdf([ops]), expected


def synth_two_column_pdf(
    seed: int,
) -> tuple[bytes, list[tuple[str, str | None]]]:
    """Deterministic two-column page + its expected COLUMN-MAJOR order.

    Left column starts at x=72, right at x=330 (gutter start gap 258 >
    the parser's 150-unit channel threshold); both columns share the
    same baseline grid, so a row-major reader would interleave them.
    Expected order is constructed alongside the bytes: heading, all
    left-column lines top-to-bottom, then all right-column lines.
    """
    n_lines = 4 + seed % 3
    ops: list[tuple] = [("text", 72, 740, 24, f"Two Column {seed}")]
    expected: list[tuple[str, str | None]] = [
        ("heading", f"Two Column {seed}")
    ]
    left, right = [], []
    for li in range(n_lines):
        lwords = " ".join(
            _WORDS[(seed * 5 + li * 3 + w) % len(_WORDS)] for w in range(4)
        )
        rwords = " ".join(
            _WORDS[(seed * 3 + li * 7 + w + 1) % len(_WORDS)]
            for w in range(4)
        )
        y = 700 - 16 * li
        ops.append(("text", 72, y, 11, lwords))
        ops.append(("text", 330, y, 11, rwords))
        left.append(("text", lwords))
        right.append(("text", rwords))
    expected.extend(left)
    expected.extend(right)
    return build_pdf([ops]), expected


def synth_rotated_pdf(
    seed: int,
) -> tuple[bytes, list[tuple[str, str | None]]]:
    """Deterministic page mixing upright flow with rotated margin
    columns (90deg on even seeds, 270deg on odd) + expected order.

    The parser's documented contract for axis-aligned rotated text:
    rotated columns read AFTER the page's upright flow, left-to-right
    by column x, each column's runs in baseline-flow order — the
    expectations here are constructed from exactly that rule.  At most
    TWO rotated columns per page: the XY-cut requires >=3 distinct
    baselines per side, so the rotated events (one baseline per
    column) can never fake a column gutter.
    """
    quad = 90 if seed % 2 == 0 else 270
    title = f"Rotated {seed}"
    ops: list[tuple] = [("text", 72, 740, 24, title)]
    expected: list[tuple[str, str | None]] = [("heading", title)]
    n_lines = 2 + seed % 3
    y = 700
    for li in range(n_lines):
        line = " ".join(
            _WORDS[(seed * 11 + li * 7 + w) % len(_WORDS)]
            for w in range(5)
        )
        ops.append(("text", 72, y, 11, line))
        expected.append(("text", line))
        y -= 16
    n_cols = 1 + seed % 2
    base_y = 120 if quad == 90 else 700
    for k in range(n_cols):
        label = " ".join(
            _WORDS[(seed * 13 + k * 3 + w) % len(_WORDS)]
            for w in range(3)
        )
        ops.append(("text_rot", 500 + 16 * k, base_y, 10, label, quad))
        expected.append(("text", label))
    return build_pdf([ops]), expected


def synth_cid_pdf(
    seed: int,
) -> tuple[bytes, list[tuple[str, str | None]]]:
    """Deterministic Type0/CID page with /W width metrics + expected
    spans.

    Body words are PER-WORD positioned runs (the Word/Quartz layout) at
    x offsets computed from the SAME /W advances build_pdf emits
    (cid_glyph_width; the last assigned code falls to /DW) — so the
    parser's 0.3em gap rule inserts a space exactly where the
    construction placed a 0.45em gap and joins verbatim across the
    0.05em gaps.  A parser estimating half-em instead of reading /W
    mis-measures the pen end and flips gap classifications; the
    expectation is arithmetic in the construction, never parser-derived.
    """
    title = f"CID Metrics {seed}"
    n_lines = 2 + seed % 3
    lines: list[list[str]] = []
    for li in range(n_lines):
        lines.append(
            [
                _WORDS[(seed * 17 + li * 5 + w * 2) % len(_WORDS)]
                for w in range(4)
            ]
        )
    # build_pdf's own glyph assignment (shared helper, never a copy);
    # the last code uses /DW by the cid_widths emission rule
    code = assign_glyph_codes([title, *[w for ln in lines for w in ln]])
    max_code = max(code.values())

    def _w(ch: str) -> float:
        c = code[ch]
        return CID_DW if c == max_code else cid_glyph_width(c)

    def _adv(word: str, size: float) -> float:
        return sum(_w(ch) for ch in word) / 1000.0 * size

    ops: list[tuple] = [("text", 72, 740, 24, title)]
    expected: list[tuple[str, str | None]] = [("heading", title)]
    size = 11
    y = 700
    for li, words in enumerate(lines):
        x = 72.0
        text_parts: list[str] = []
        for k, word in enumerate(words):
            if k:
                spaced = (seed + li + k) % 2 == 0
                gap = (0.45 if spaced else 0.05) * size
                x += gap
                if spaced:
                    text_parts.append(" ")
            ops.append(("text", round(x, 4), y, size, word))
            text_parts.append(word)
            x += _adv(word, size)
        expected.append(("text", "".join(text_parts)))
        y -= 16
    return build_pdf([ops], cmap_fonts=True, cid_widths=True), expected


def synth_table_pdf(
    seed: int,
) -> tuple[bytes, list[tuple[str, str | None]]]:
    """Deterministic page with a ruled data table + expected spans.

    The grid is drawn with BOTH path forms real producers use — the
    outer border as a stroked ``re`` rectangle, inner rules as ``m/l``
    segments — and one word sits in each cell, its baseline inside its
    row band and its start x inside its column.  The expected 'table'
    span text is assembled from the same construction arithmetic
    (cells row-major, `` | `` between cells, newline between rows),
    never from the parser; a closing body line below the grid pins that
    normal flow resumes after the table.
    """
    title = f"Table Report {seed}"
    ops: list[tuple] = [("text", 72, 740, 24, title)]
    expected: list[tuple[str, str | None]] = [("heading", title)]
    y = 700.0
    for li in range(1 + seed % 2):
        line = " ".join(
            _WORDS[(seed * 19 + li * 7 + w) % len(_WORDS)]
            for w in range(5)
        )
        ops.append(("text", 72, y, 11, line))
        expected.append(("text", line))
        y -= 16
    rows = 2 + seed % 3
    cols = 2 + seed % 2
    col_w, row_h, x0 = 110.0, 24.0, 72.0
    top = y - 30.0
    bottom = top - rows * row_h
    width = cols * col_w
    ops.append(("rect", x0, bottom, width, rows * row_h))
    for i in range(1, rows):
        ops.append(
            ("line", x0, bottom + i * row_h, x0 + width, bottom + i * row_h)
        )
    for j in range(1, cols):
        ops.append(("line", x0 + j * col_w, bottom, x0 + j * col_w, top))
    cell_rows: list[list[str]] = []
    for i in range(rows):
        rcells: list[str] = []
        for j in range(cols):
            word = _WORDS[(seed * 23 + i * 5 + j * 3) % len(_WORDS)]
            ops.append(
                ("text", x0 + j * col_w + 8, top - i * row_h - 15, 10, word)
            )
            rcells.append(word)
        cell_rows.append(rcells)
    expected.append(
        ("table", "\n".join(" | ".join(r) for r in cell_rows))
    )
    closing = " ".join(
        _WORDS[(seed * 29 + w) % len(_WORDS)] for w in range(4)
    )
    ops.append(("text", 72, bottom - 24, 11, closing))
    expected.append(("text", closing))
    return build_pdf([ops]), expected


def synth_inline_pdf(
    seed: int,
) -> tuple[bytes, list[tuple[str, str | None]]]:
    """Deterministic page mixing text with BI/ID/EI inline images.

    Sample bytes are arbitrary binary EXCEPT 0x45 ('E') is remapped to
    0x46: the parser's data-extent rule (first whitespace-preceded
    ``EI``, the spec's own lenient scan) would truncate an image whose
    samples happen to contain that pattern, and a construction-time
    expectation must not depend on the parser's recovery of that edge
    (the hostile-bytes case is a unit test, not a golden).  Even seeds
    additionally armor the whole content stream as
    /Filter [/ASCII85Decode /FlateDecode], exercising the filter chain
    in the corpus.
    """
    import hashlib

    title = f"Inline Art {seed}"
    ops: list[tuple] = [("text", 72, 740, 24, title)]
    expected: list[tuple[str, str | None]] = [("heading", title)]
    n_lines = 2 + seed % 3
    y = 700
    for li in range(n_lines):
        words = [
            _WORDS[(seed * 11 + li * 7 + w * 3) % len(_WORDS)]
            for w in range(5)
        ]
        line = " ".join(words)
        ops.append(("text", 72, y, 11, line))
        expected.append(("text", line))
        y -= 16
    for k in range(1 + seed % 2):
        raw = bytes(
            v if (v := (seed * 29 + k * 13 + i * 7) % 256) != 0x45 else 0x46
            for i in range(12)
        )
        ops.append(("inline_image", 72 + 40 * k, y - 60, raw))
        expected.append(
            ("image", f"pdfimg:{hashlib.sha1(raw).hexdigest()}")
        )
    return build_pdf([ops], ascii85=(seed % 2 == 0)), expected
