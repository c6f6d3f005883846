"""Pure-Python PDF layout parser: PDF bytes -> ordered content spans.

The north rule asks for "PDF/layout parse" alongside the HTML transform;
the reference service is HTML-only (/root/reference/src/index.js has no
PDF path), so this surface is designed Spark-first from the published PDF
1.4 object model (ISO 32000 subset): body objects, FlateDecode content
streams, BT/ET text objects with Td/TD/Tm/T* positioning, Tj/TJ/' show
operators, and Do-invoked image XObjects.

Output model matches the extraction span contract
(operators/extract.py SPAN_TYPE): ``(kind, text, media_ref, order)``
where kind is ``heading`` / ``text`` / ``image`` / ``link`` (URI link
annotations, the PDF counterpart of the HTML path's link handling —
media_ref carries the URI) / ``table`` (ruled grids detected from
painted path rules, the PDF counterpart of the HTML path's
<table> -> gridTable handling — text carries cells row-major, ``` | ```
between cells, newline between rows).  Layout recovery:

* text runs carry (page, y, x, font_size); runs sharing a page and a
  y-baseline (rounded) fold into one line, left-to-right
* reading order = page asc, baseline y desc (PDF origin is bottom-left),
  x asc — the standard single-column layout ordering
* a line whose max font size >= ``heading_min_size`` becomes a heading
* image XObjects become ``image`` spans content-addressed by the sha1 of
  their (decoded) stream bytes, mirroring the media-hash convention of
  the HTML path (media_1<sha1>, /root/reference/test/index.test.js:123)

No third-party PDF library is available in this container and none is
used: zlib is stdlib.  The parser is lenient — a malformed object or
stream degrades that object, not the document (same per-row resilience
contract as the HTML transform).
"""

from __future__ import annotations

import base64
import hashlib
import re
import zlib

__all__ = ["parse_pdf", "PdfError"]


class PdfError(ValueError):
    """Raised when the document is not parseable as PDF at all."""


_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)\bendobj", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.S)

# content-stream tokens: names, numbers, strings, hex strings, arrays,
# and bare operators
_TOK_RE = re.compile(
    rb"/[^\s/\[\]()<>{}%]+"  # name
    rb"|[-+]?\d*\.?\d+"  # number
    # literal string, ONE level of unescaped balanced parens supported
    # (ISO 32000 permits them; '(He said (hi) twice)' is real-producer
    # output — deeper nesting still truncates, documented limit)
    rb"|\((?:\\.|[^\\()]|\((?:\\.|[^\\()])*\))*\)"
    rb"|<[0-9A-Fa-f\s]*>"  # hex string
    rb"|\[|\]"
    rb"|[A-Za-z'\"*]+"  # operator
)

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _decode_pdf_string(tok: bytes) -> str:
    """Literal ``(...)`` or hex ``<...>`` string token -> text."""
    if tok.startswith(b"<"):
        hexdigits = re.sub(rb"\s", b"", tok[1:-1])
        if len(hexdigits) % 2:
            hexdigits += b"0"
        return bytes.fromhex(hexdigits.decode("ascii")).decode(
            "latin-1", "replace"
        )
    body = tok[1:-1]
    out = bytearray()
    i = 0
    while i < len(body):
        c = body[i : i + 1]
        if c == b"\\" and i + 1 < len(body):
            nxt = body[i + 1 : i + 2]
            if nxt in b"01234567" and nxt:  # octal \ddd (1-3 digits)
                # ONLY 0-7: isdigit would admit \8/\9 and the base-8
                # int() would raise out of any handler, killing the
                # whole document for one malformed escape
                j = i + 1
                while (
                    j < len(body)
                    and j < i + 4
                    and body[j : j + 1] in b"01234567"
                    and body[j : j + 1]
                ):
                    j += 1
                out.append(int(body[i + 1 : j], 8) & 0xFF)
                i = j
                continue
            out += _ESCAPES.get(nxt, nxt)
            i += 2
            continue
        out += c
        i += 1
    return out.decode("latin-1", "replace")


# -- /ToUnicode CMap (subset-font text decoding) -----------------------------

_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_HEXTOK_RE = re.compile(rb"<([0-9A-Fa-f]+)>")
_BFRANGE_TOK_RE = re.compile(rb"<[0-9A-Fa-f]+>|\[|\]")


def _parse_tounicode(stream: bytes) -> dict[int, str]:
    """CMap stream -> {glyph code: unicode string} (bfchar + bfrange).

    Subset-embedded fonts show text as glyph codes meaningless without
    this map — the dominant layout of modern PDF producers."""
    cmap: dict[int, str] = {}
    for m in _BFCHAR_RE.finditer(stream):
        toks = _HEXTOK_RE.findall(m.group(1))
        for i in range(0, len(toks) - 1, 2):
            try:
                dst_hex = toks[i + 1]
                if len(dst_hex) % 4:
                    dst_hex = dst_hex.ljust(
                        (len(dst_hex) + 3) // 4 * 4, b"0"
                    )
                cmap[int(toks[i], 16)] = bytes.fromhex(
                    dst_hex.decode("ascii")
                ).decode("utf-16-be", "replace")
            except ValueError:
                continue
    def _dst_str(hexdigits: bytes) -> str:
        # destination may be a UTF-16BE sequence (surrogate pairs for
        # astral chars — math-alphanumeric fonts emit these); chr() of
        # the raw 8-digit value would raise OverflowError
        if len(hexdigits) % 4:
            hexdigits = hexdigits.ljust(
                (len(hexdigits) + 3) // 4 * 4, b"0"
            )
        return bytes.fromhex(hexdigits.decode("ascii")).decode(
            "utf-16-be", "replace"
        )

    for m in _BFRANGE_RE.finditer(stream):
        # tokenization keeps brackets: ISO 32000's second bfrange form
        # (<lo> <hi> [<d1> <d2> ...]) maps each code to its own listed
        # destination; flattening the brackets would misalign every
        # subsequent group-of-3
        toks = _BFRANGE_TOK_RE.findall(m.group(1))
        i = 0
        while i + 2 < len(toks) or (
            i + 2 == len(toks) and toks[i + 1 :] and toks[-1] != b"["
        ):
            try:
                if toks[i] == b"[" or toks[i + 1] == b"[":
                    break  # malformed: bracket where a range bound goes
                lo = int(toks[i][1:-1], 16)
                hi = int(toks[i + 1][1:-1], 16)
            except (ValueError, IndexError):
                break
            i += 2
            if i < len(toks) and toks[i] == b"[":
                j = i + 1
                dsts = []
                while j < len(toks) and toks[j] != b"]":
                    dsts.append(toks[j])
                    j += 1
                for k, c in enumerate(
                    range(lo, min(hi, lo + 0xFFFF) + 1)
                ):
                    if k < len(dsts):
                        try:
                            cmap[c] = _dst_str(dsts[k][1:-1])
                        except ValueError:
                            continue
                i = j + 1
            elif i < len(toks):
                try:
                    base = _dst_str(toks[i][1:-1])
                except ValueError:
                    i += 1
                    continue
                i += 1
                for c in range(lo, min(hi, lo + 0xFFFF) + 1):
                    # increment applies to the LAST code unit (CMap
                    # range semantics); clamp to the unicode range
                    off = c - lo
                    if base:
                        last = ord(base[-1]) + off
                        if last > 0x10FFFF:
                            continue
                        cmap[c] = base[:-1] + chr(last)
                    else:
                        cmap[c] = ""
            else:
                break
    return cmap


def _decode_with_cmap_cids(
    tok: bytes, cmap: dict[int, str]
) -> tuple[str, list[int]]:
    """Hex show-string of 2-byte glyph codes -> (text, CID list).

    The CID list drives /W metrics lookups: advances are per GLYPH
    CODE, not per output character (a bfchar destination may be
    multi-char, e.g. a ligature expanding to 'ffi')."""
    hexdigits = re.sub(rb"\s", b"", tok[1:-1])
    if len(hexdigits) % 4:
        hexdigits = hexdigits.ljust((len(hexdigits) + 3) // 4 * 4, b"0")
    try:
        raw = bytes.fromhex(hexdigits.decode("ascii"))
    except ValueError:
        return "", []
    cids = [
        (raw[i] << 8) | raw[i + 1] for i in range(0, len(raw) - 1, 2)
    ]
    return "".join(cmap.get(c, "") for c in cids), cids


def _parse_w_array(arr: list) -> dict[int, float]:
    """CIDFont /W array -> {CID: width} (ISO 32000 §9.7.4.3).

    Both forms, freely mixed: ``c [w1 w2 ...]`` assigns consecutive
    CIDs starting at c their listed widths; ``c_first c_last w`` assigns
    one width to a whole range.  Malformed runs stop the scan (lenient:
    whatever parsed so far still serves; missing CIDs fall to /DW)."""
    out: dict[int, float] = {}
    i = 0
    while i < len(arr):
        a = arr[i]
        if not isinstance(a, float):
            break
        if i + 1 < len(arr) and isinstance(arr[i + 1], list):
            for k, w in enumerate(arr[i + 1]):
                if isinstance(w, float):
                    out[int(a) + k] = w
            i += 2
        elif (
            i + 2 < len(arr)
            and isinstance(arr[i + 1], float)
            and isinstance(arr[i + 2], float)
        ):
            lo, hi = int(a), int(arr[i + 1])
            for c in range(lo, min(hi, lo + 0xFFFF) + 1):
                out[c] = arr[i + 2]
            i += 3
        else:
            break
    return out


# -- minimal object-dictionary reader ---------------------------------------

_DICT_TOK_RE = re.compile(
    rb"<<|>>|\[|\]|/[^\s/\[\]()<>{}%]+|\d+\s+\d+\s+R"
    rb"|[-+]?\d*\.?\d+"
    rb"|\((?:\\.|[^\\()]|\((?:\\.|[^\\()])*\))*\)"  # depth-2 strings
    rb"|true|false|null"
)


def _parse_value(toks: list[bytes], pos: int, depth: int = 0):
    # depth bound: hostile input of a few KB of '[' would otherwise
    # recurse past the interpreter limit; ValueError lands in
    # _parse_dict's lenient except (one object degrades, not the doc)
    if depth > 64:
        raise ValueError("nesting too deep")
    t = toks[pos]
    if t == b"<<":
        d = {}
        pos += 1
        while pos < len(toks) and toks[pos] != b">>":
            if not toks[pos].startswith(b"/"):
                pos += 1  # lenient: skip stray token
                continue
            key = toks[pos][1:].decode("latin-1")
            val, pos = _parse_value(toks, pos + 1, depth + 1)
            d[key] = val
        return d, pos + 1
    if t == b"[":
        arr = []
        pos += 1
        while pos < len(toks) and toks[pos] != b"]":
            val, pos = _parse_value(toks, pos, depth + 1)
            arr.append(val)
        return arr, pos + 1
    if t.startswith(b"/"):
        return ("name", t[1:].decode("latin-1")), pos + 1
    m = re.fullmatch(rb"(\d+)\s+(\d+)\s+R", t)
    if m:
        return ("ref", int(m.group(1))), pos + 1
    if re.fullmatch(rb"[-+]?\d*\.?\d+", t):
        return float(t), pos + 1
    if t in (b"true", b"false", b"null"):
        return t == b"true", pos + 1
    return _decode_pdf_string(t), pos + 1


def _body_head(raw: bytes) -> bytes:
    """Object body up to its stream keyword: tokenizing a multi-MB
    binary payload wastes CPU and can fabricate garbage tokens."""
    m = _STREAM_RE.search(raw)
    return raw[: m.start()] if m else raw


def _parse_dict(raw: bytes) -> dict:
    raw = _body_head(raw)
    start = raw.find(b"<<")
    if start < 0:
        return {}
    toks = _DICT_TOK_RE.findall(raw[start:])
    try:
        val, _ = _parse_value(toks, 0)
    except (IndexError, ValueError):
        return {}
    return val if isinstance(val, dict) else {}


def _rle_decode(data: bytes) -> bytes | None:
    """RunLengthDecode (PDF 32000 §7.4.5): <=127 -> copy n+1 literals,
    129..255 -> repeat next byte 257-n times, 128 -> EOD."""
    out = bytearray()
    i = 0
    while i < len(data):
        n = data[i]
        if n == 128:
            break
        if n < 128:
            chunk = data[i + 1 : i + 2 + n]
            if len(chunk) != n + 1:
                return None
            out += chunk
            i += 2 + n
        else:
            if i + 1 >= len(data):
                return None
            out += data[i + 1 : i + 2] * (257 - n)
            i += 2
    return bytes(out)


def _lzw_decode(data: bytes) -> bytes | None:
    """LZWDecode (PDF 32000 §7.4.4, TIFF variant): 9->12-bit codes,
    256 = clear table, 257 = EOD, EarlyChange=1 (the default: the code
    width bumps one code BEFORE the table would overflow)."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None
    acc = nbits = 0
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:
                table = [bytes([i]) for i in range(256)] + [b"", b""]
                width = 9
                prev = None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    return None
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                return None
            out += entry
            prev = entry
            # EarlyChange=1: widen one code early
            if len(table) + 1 >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


def _a85_decode(data: bytes) -> bytes | None:
    """ASCII85Decode (PDF 32000 §7.4.3): 5 chars -> 4 bytes base-85,
    'z' = a zero group, whitespace ignored, '~>' ends the data (a
    leading '<~' from btoa-style producers is tolerated)."""
    end = data.find(b"~>")
    if end >= 0:
        data = data[:end]
    data = data.strip()
    if data.startswith(b"<~"):
        data = data[2:]
    try:
        # ignore ALL PDF whitespace (§7.2.2), not just a85decode's
        # default set: \f and \x00 are spec-legal inside the armor
        return base64.a85decode(data, ignorechars=b" \t\n\r\v\f\x00")
    except ValueError:
        return None


def _stream_bytes(body: bytes, info: dict) -> bytes | None:
    m = _STREAM_RE.search(body)
    if not m:
        return None
    data = m.group(1)
    # /Length is authoritative when plausible: the EOL-strip heuristic
    # below cannot distinguish a payload that legitimately ends in \r
    # from a writer's \r\n before `endstream` (a FlateDecode stream
    # ending in 0x0D loses its last byte and fails to inflate).  Slice
    # from the BODY, not the regex capture: the non-greedy capture stops
    # at the first 'endstream' byte sequence, which can legitimately
    # occur INSIDE compressed payload bytes
    length = info.get("Length")
    if isinstance(length, float) and int(length) >= 0:
        s = m.start(1)
        if s + int(length) <= len(body):
            data = body[s : s + int(length)]
        elif int(length) <= len(data):
            data = data[: int(length)]
    # spec: stream data ends before the EOL preceding `endstream`
    elif data.endswith(b"\r\n"):
        data = data[:-2]
    elif data.endswith(b"\n") or data.endswith(b"\r"):
        data = data[:-1]
    filt = info.get("Filter")
    names = []
    if isinstance(filt, tuple) and filt[0] == "name":
        names = [filt[1]]
    elif isinstance(filt, list):
        names = [f[1] for f in filt if isinstance(f, tuple)]
    for name in names:
        if name == "FlateDecode":
            try:
                data = zlib.decompress(data)
            except zlib.error:
                return None
        elif name == "ASCIIHexDecode":
            # hex digits up to the EOD marker '>'; whitespace ignored,
            # odd trailing digit padded with 0 (PDF 32000 §7.4.2);
            # chains with a following FlateDecode
            hexdigits = re.sub(
                rb"[^0-9A-Fa-f>]", b"", data
            ).split(b">")[0]
            if len(hexdigits) % 2:
                hexdigits += b"0"
            try:
                data = bytes.fromhex(hexdigits.decode("ascii"))
            except ValueError:
                return None
        elif name == "RunLengthDecode":
            decoded = _rle_decode(data)
            if decoded is None:
                return None
            data = decoded
        elif name == "LZWDecode":
            decoded = _lzw_decode(data)
            if decoded is None:
                return None
            data = decoded
        elif name == "ASCII85Decode":
            decoded = _a85_decode(data)
            if decoded is None:
                return None
            data = decoded
        else:  # unsupported filter: keep raw (images are hashed, not read)
            return data
    return data


class _Obj:
    __slots__ = ("num", "info", "stream", "arr")

    def __init__(self, num, info, stream, arr=None):
        self.num, self.info, self.stream, self.arr = num, info, stream, arr


def _load_objects(data: bytes) -> dict[int, _Obj]:
    objs: dict[int, _Obj] = {}
    bodies: dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(data):
        bodies[int(m.group(1))] = m.group(3)
    # pass 1: plain-integer object bodies (the common indirect /Length
    # target: "5 0 obj 1234 endobj") — resolved before stream slicing so
    # /Length N 0 R is as authoritative as a direct /Length (the EOL
    # heuristic fallback is lossy for payloads ending in \r)
    int_objs: dict[int, int] = {}
    for num, body in bodies.items():
        mm = re.fullmatch(rb"\s*([-+]?\d+)\s*", body)
        if mm:
            int_objs[num] = int(mm.group(1))
    for num, body in bodies.items():
        info = _parse_dict(body)
        length = info.get("Length")
        if isinstance(length, tuple) and length[0] == "ref":
            if length[1] in int_objs:
                info["Length"] = float(int_objs[length[1]])
            else:
                info.pop("Length")
        # bare-array objects (the indirect form of /Annots, /Kids,
        # /Contents arrays): "7 0 obj [1 0 R 2 0 R] endobj".  Only for
        # stream-less bodies: a '[' inside binary stream bytes must not
        # fabricate a garbage array
        arr = None
        if not info and _STREAM_RE.search(body) is None:
            start = body.find(b"[")
            if start >= 0:
                toks = _DICT_TOK_RE.findall(body[start:])
                try:
                    val, _ = _parse_value(toks, 0)
                    if isinstance(val, list):
                        arr = val
                except (IndexError, ValueError):
                    pass
        objs[num] = _Obj(num, info, _stream_bytes(body, info), arr)
    # PDF 1.5+ object streams: dict-only objects (pages, fonts,
    # resources) packed inside a FlateDecode stream — invisible to the
    # body scan above until unpacked.  Stream layout: /N pairs of
    # "objnum offset" in the first /First bytes, then the object bodies.
    for obj in list(objs.values()):
        if obj.info.get("Type") != ("name", "ObjStm") or not obj.stream:
            continue
        try:
            n = int(obj.info.get("N") or 0)
            first = int(obj.info.get("First") or 0)
            head = obj.stream[:first].split()
            pairs = [
                (int(head[i]), int(head[i + 1]))
                for i in range(0, min(len(head) - 1, 2 * n), 2)
            ]
            for idx, (num, off) in enumerate(pairs):
                end = (
                    first + pairs[idx + 1][1]
                    if idx + 1 < len(pairs)
                    else len(obj.stream)
                )
                body = obj.stream[first + off : end]
                if num not in objs:  # body-scan objects take precedence
                    info = _parse_dict(body)
                    # bare-array members (indirect /Kids, /Annots,
                    # /Contents arrays are dict-free and get packed
                    # into ObjStms by real producers too)
                    arr = None
                    if not info:
                        start = body.find(b"[")
                        if start >= 0:
                            toks = _DICT_TOK_RE.findall(body[start:])
                            try:
                                val, _ = _parse_value(toks, 0)
                                if isinstance(val, list):
                                    arr = val
                            except (IndexError, ValueError):
                                pass
                    objs[num] = _Obj(num, info, None, arr)
        except (ValueError, IndexError):
            continue  # corrupted ObjStm degrades, never aborts
    return objs


def _deref(objs: dict[int, _Obj], val):
    if isinstance(val, tuple) and val[0] == "ref":
        obj = objs.get(val[1])
        return obj.info if obj else None
    return val


def _deref_dict(objs: dict[int, _Obj], val) -> dict:
    """_deref that tolerates corrupted refs resolving to non-dicts."""
    out = _deref(objs, val)
    return out if isinstance(out, dict) else {}


def _resolve_array(objs: dict[int, _Obj], val) -> list | None:
    """Direct array, or a ref to a bare-array object — else None."""
    if isinstance(val, tuple) and val[0] == "ref":
        obj = objs.get(val[1])
        return obj.arr if obj is not None else None
    return val if isinstance(val, list) else None


def _page_order(objs: dict[int, _Obj]) -> list[tuple[_Obj, object]]:
    """(page, effective /Resources) in /Root -> /Pages tree order;
    object-number fallback.

    Intermediate /Pages nodes (standard in real multi-page PDFs, which
    balance the page tree) are recursed into depth-first, flattening
    leaf Page objects in tree order; a visited set guards against
    reference cycles in hostile input.  /Resources is INHERITABLE
    (ISO 32000 §7.7.3.4): real producers hoist the shared font/XObject
    dict onto an ancestor /Pages node, so each leaf carries the nearest
    ancestor's value when it declares none of its own."""
    pages: list[tuple[_Obj, object]] = []
    visited: set[int] = set()

    def walk(root_node: dict, root_res) -> None:
        # ITERATIVE pre-order (a hostile /Kids chain could otherwise
        # recurse past the interpreter limit).  Uniform item stack —
        # a leaf EMITS on pop, a node EXPANDS on pop — so leaves and
        # sibling subtrees interleave in true tree order.
        stack: list[tuple] = [("node", root_node, root_res)]
        while stack:
            item_kind, payload, inherited_res = stack.pop()
            if item_kind == "leaf":
                pages.append((payload, inherited_res))
                continue
            node = payload
            res = node.get("Resources", inherited_res)
            kids = _resolve_array(objs, node.get("Kids"))
            if not kids:
                continue
            items: list[tuple] = []
            for kid in kids:
                if not (isinstance(kid, tuple) and kid[0] == "ref"):
                    continue
                if kid[1] in visited:
                    continue
                visited.add(kid[1])
                kobj = objs.get(kid[1])
                if kobj is None:
                    continue
                # an intermediate node is one typed /Pages OR any
                # content-less node carrying /Kids (lenient producers
                # omit /Type; treating such a node as a leaf would
                # silently drop its whole subtree of pages)
                is_pages = kobj.info.get("Type") == ("name", "Pages") or (
                    "Contents" not in kobj.info
                    and _resolve_array(objs, kobj.info.get("Kids"))
                    is not None
                )
                if is_pages:
                    items.append(("node", kobj.info, res))
                else:
                    items.append(
                        ("leaf", kobj, kobj.info.get("Resources", res))
                    )
            stack.extend(reversed(items))

    for obj in objs.values():
        if obj.info.get("Type") == ("name", "Catalog"):
            root = _deref_dict(objs, obj.info.get("Pages"))
            walk(root, root.get("Resources"))
            if pages:
                return pages
    return sorted(
        (
            (o, o.info.get("Resources"))
            for o in objs.values()
            if o.info.get("Type") == ("name", "Page")
        ),
        key=lambda t: t[0].num,
    )


# -- column detection --------------------------------------------------------

# minimum empty vertical whitespace channel (text-space units) between
# two x-clusters before they read as page columns; a 612-unit letter
# page's gutter is ~40-80 units wide but starts ~230-320 from each
# column's left edge, so the START-position gap for true columns is
# large, while intra-line continuation runs and modest indents are not
_COLUMN_GAP = 150.0


def _column_split(page_events: list[tuple]) -> float | None:
    """Single vertical XY-cut: return the split x for a two-column page.

    Conservative by design: the largest gap between distinct run start
    positions must exceed ``_COLUMN_GAP`` AND each side must carry >= 3
    distinct baselines AND the sides' y-ranges must overlap (side by
    side, not stacked).  Known tradeoff of the published XY-cut family:
    an UNRULED data table with >=3 rows and a >=150-unit column gutter
    reads column-major (ruled tables are consumed by _assemble_tables
    before the cut and are immune); single-column pages with
    continuation runs or indents never split (continuation runs share
    too few baselines).
    """
    runs = [e for e in page_events if e[3][0] == "t"]
    xs = sorted({e[2] for e in runs})
    if len(xs) < 2:
        return None
    gap, split = 0.0, None
    for a, b in zip(xs, xs[1:]):
        if b - a > gap:
            gap, split = b - a, (a + b) / 2.0
    if split is None or gap < _COLUMN_GAP:
        return None
    left_y = {e[1] for e in runs if e[2] < split}
    right_y = {e[1] for e in runs if e[2] >= split}
    if len(left_y) < 3 or len(right_y) < 3:
        return None
    if min(max(left_y), max(right_y)) <= max(min(left_y), min(right_y)):
        return None
    return split


# -- ruled-table detection ----------------------------------------------------

# how far apart two painted rule positions may sit and still read as the
# same grid line (producers double-stroke borders), and how much slack a
# rule's extent gets when checked against the crossing lines' span
_RULE_CLUSTER = 1.0
_RULE_TOL = 3.0


def _merge_rules(segs: list[tuple]) -> list[tuple[float, float, float]]:
    """Collapse collinear painted segments into maximal (pos, lo, hi)
    lines: positions within ``_RULE_CLUSTER`` are one line, and extents
    along it merge when they overlap or nearly touch.  Runs to a
    FIXPOINT: a merge can widen an entry until it reaches a neighbor
    that was rejected earlier (dashes drawn out of extent order at
    slightly different positions), so one first-fit pass is not
    enough."""
    cur: list[tuple[float, float, float]] = [
        (pos, lo, hi)
        for _, pos, lo, hi in sorted(segs, key=lambda s: (s[1], s[2]))
    ]
    while True:
        out: list[tuple[float, float, float]] = []
        for pos, lo, hi in cur:
            placed = False
            for i, (p, plo, phi) in enumerate(out):
                if abs(pos - p) <= _RULE_CLUSTER:
                    if lo <= phi + 2.0 and hi >= plo - 2.0:
                        out[i] = (p, min(plo, lo), max(phi, hi))
                        placed = True
                        break
            if not placed:
                out.append((pos, lo, hi))
        if len(out) == len(cur):
            return out
        cur = out


def _detect_tables(
    rules: list[tuple],
) -> list[tuple[list[float], list[float]]]:
    """Find ruled-table grids among a page's painted rule segments.

    Returns ``[(ys_desc, xs_asc), ...]`` — the row/column boundary
    positions of each detected grid.  Conservative by design, mirroring
    the published T-Recs/pdfplumber lattice family: a grid needs at
    least 3 horizontal and 3 vertical lines (>= 2x2 cells — a plain
    stroked figure box is 2+2 and never qualifies), mutually connected,
    and COMPLETE: every horizontal rule spans the full x-range of the
    vertical rules and vice versa (within ``_RULE_TOL``).  Partial rule
    boxes (underlines, side bars) therefore stay in the normal text
    flow rather than half-capturing it.
    """
    hs = _merge_rules([r for r in rules if r[0] == "h"])
    vs = _merge_rules([r for r in rules if r[0] == "v"])
    if len(hs) < 3 or len(vs) < 3:
        return []

    # connected components over the h/v intersection graph
    n_h, n_v = len(hs), len(vs)
    parent = list(range(n_h + n_v))

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i, (y, x0, x1) in enumerate(hs):
        for j, (x, y0, y1) in enumerate(vs):
            if (
                x0 - _RULE_TOL <= x <= x1 + _RULE_TOL
                and y0 - _RULE_TOL <= y <= y1 + _RULE_TOL
            ):
                ra, rb = find(i), find(n_h + j)
                if ra != rb:
                    parent[ra] = rb

    comps: dict[int, tuple[list, list]] = {}
    for i, h in enumerate(hs):
        comps.setdefault(find(i), ([], []))[0].append(h)
    for j, v in enumerate(vs):
        comps.setdefault(find(n_h + j), ([], []))[1].append(v)

    grids: list[tuple[list[float], list[float]]] = []
    for ch, cv in comps.values():
        if len(ch) < 3 or len(cv) < 3:
            continue
        xs = sorted(x for x, _, _ in cv)
        ys = sorted((y for y, _, _ in ch), reverse=True)
        if all(
            x0 <= xs[0] + _RULE_TOL and x1 >= xs[-1] - _RULE_TOL
            for _, x0, x1 in ch
        ) and all(
            y0 <= ys[-1] + _RULE_TOL and y1 >= ys[0] - _RULE_TOL
            for _, y0, y1 in cv
        ):
            grids.append((ys, xs))
    return grids


def _join_runs(parts: list[tuple[float, str, float, float]]) -> str:
    """Gap-aware join of one baseline's runs ((size, text, sx, ex) in
    x order): per-word-positioned producers (one Td/Tm per word) would
    otherwise glue the whole line; a start-x more than ~0.3em past the
    previous run's estimated end reads as an inter-word space.  Runs
    continuing at the pen position (gap ~0) and runs whose text already
    carries the space join verbatim."""
    pieces: list[str] = []
    prev_end: float | None = None
    prev_size = 0.0
    for size, text, sx, ex in parts:
        if (
            pieces
            and prev_end is not None
            and sx - prev_end > 0.3 * max(prev_size, size)
            and not pieces[-1].endswith(" ")
            and not text.startswith(" ")
        ):
            pieces.append(" ")
        pieces.append(text)
        prev_end, prev_size = ex, size
    return "".join(pieces).strip()


def _assemble_tables(
    events: list[tuple], page_rules: dict[int, list[tuple]]
) -> list[tuple]:
    """Capture text runs inside each detected rule grid into one
    ``("tbl", text)`` event at the grid's top-left; all other events
    pass through unchanged.

    Cell addressing is geometric: a run belongs to the cell whose rule
    boundaries bracket its baseline y and start x.  Within a cell,
    same-baseline runs fold with the standard gap rule and distinct
    baselines (wrapped cell text) join with a single space.  A grid
    whose cells hold no text at all (a decorative empty frame) emits
    nothing.  Rotated-text events cannot be captured: their sort key
    encodes -x as the line position, which is negative where grids
    live in positive page space.
    """
    if not page_rules:
        return events
    by_page: dict[int, list[tuple]] = {}
    for e in events:
        by_page.setdefault(e[0], []).append(e)
    out: list[tuple] = []
    for page in sorted(set(by_page) | set(page_rules)):
        evs = by_page.get(page, [])
        for ys, xs in _detect_tables(page_rules.get(page, [])):
            top, bottom, left, right = ys[0], ys[-1], xs[0], xs[-1]
            cells: dict[tuple[int, int], list[tuple]] = {}
            rest: list[tuple] = []
            for e in evs:
                _, ny, x, payload = e
                y = -ny
                if not (
                    payload[0] == "t"
                    and bottom < y < top
                    and left < x < right
                ):
                    rest.append(e)
                    continue
                ri = ci = 0
                for i in range(len(ys) - 1):
                    if y > ys[i + 1]:
                        ri = i
                        break
                for j in range(len(xs) - 1):
                    if x < xs[j + 1]:
                        ci = j
                        break
                cells.setdefault((ri, ci), []).append(
                    (y, x, payload[1], payload[2], payload[3])
                )
            if not cells:
                continue

            def cell_text(ri: int, ci: int) -> str:
                lines: list[str] = []
                parts: list[tuple] = []
                line_y: float | None = None
                for y, x, size, text, ex in sorted(
                    cells.get((ri, ci), []), key=lambda r: (-r[0], r[1])
                ):
                    if line_y is not None and abs(y - line_y) > 0.5:
                        lines.append(_join_runs(parts))
                        parts = []
                    line_y = y
                    parts.append((size, text, x, ex))
                if parts:
                    lines.append(_join_runs(parts))
                return " ".join(s for s in lines if s).strip()

            text = "\n".join(
                " | ".join(
                    cell_text(ri, ci) for ci in range(len(xs) - 1)
                )
                for ri in range(len(ys) - 1)
            )
            evs = rest + [(page, -round(top, 1), left, ("tbl", text))]
        out.extend(evs)
    return out


# -- content-stream interpreter ----------------------------------------------

# kerning gap (thousandths of text space) below which a TJ adjustment
# reads as an inter-word space
_TJ_SPACE = -180.0

# inline-image section delimiters (ISO 32000 §8.9.7): BI starts the
# image dictionary, ID ends it (followed by ONE whitespace byte, then
# raw sample data), EI — preceded by whitespace — ends the data
_BI_RE = re.compile(rb"(?:\A|(?<=[\s\]>]))BI(?=[\s/])")
_ID_RE = re.compile(rb"(?<![A-Za-z])ID(?=\s)")
_EI_RE = re.compile(rb"(?<=\s)EI(?![0-9A-Za-z])")

# what may legally sit between BI and ID: the image dictionary —
# whitespace, /names, numbers, arrays, hex strings, << >> (for
# /DecodeParms dicts), booleans/null.  NO literal strings (§8.9.5
# prohibits file specifications inline), no arbitrary prose — this is
# what lets the excision tell a real image header from the word "BI"
# inside page text ("Power BI dashboards ... user ID ...")
_BI_DICT_RE = re.compile(
    rb"(?:\s|/[^\s/\[\]()<>{}%]*|[-+]?\d*\.?\d+"
    rb"|\[|\]|<<|>>|<[0-9A-Fa-f\s]*>|true|false|null)*"
)


def _bi_dict_shaped(chunk: bytes) -> bool:
    """True if ``chunk`` looks like an inline-image dictionary body:
    only dict-legal tokens, at least one /name key."""
    return (
        _BI_DICT_RE.fullmatch(chunk) is not None and b"/" in chunk
    )


def _excise_inline_images(stream: bytes) -> bytes:
    """Replace each ``BI .. ID <data> EI`` inline image with a sentinel
    ``/XI<sha1> INLINEIMG`` pair.

    Raw sample bytes must NEVER reach the token scanner: binary data can
    contain ``(..) Tj`` lookalikes that would fabricate text runs (or a
    stray ``BT`` that corrupts the text state machine).  The sentinel
    keeps the image event in content order, so the prevailing ``cm``
    offset still positions it like an XObject ``Do``.

    A ``BI`` only counts as an image start when what follows it (up to
    ``ID``, or to end-of-stream when truncated) is dictionary-shaped —
    names/numbers/arrays only, at least one key.  Raw-byte scanning is
    string-blind by nature, so without this check the word "BI" inside
    a literal show string would eat the rest of the page's text.

    Data extent is the first whitespace-preceded ``EI`` (the spec's own
    lenient scan rule — §8.9.7 notes the data length is implicit);
    sample bytes that contain that pattern truncate the HASH of that one
    image, never the page text.  Truncated real sections (dict-shaped
    but missing ID/EI) drop the tail rather than scanning binary."""
    out: list[bytes] = []
    pos = 0
    while True:
        m = _BI_RE.search(stream, pos)
        if m is None:
            break
        mid = _ID_RE.search(stream, m.end())
        if mid is None or not stream[mid.end() : mid.end() + 1]:
            # no ID anywhere after: a truncated image header drops the
            # tail; prose containing "BI" keeps scanning as text
            if _bi_dict_shaped(stream[m.end() :]):
                out.append(stream[pos : m.start()])
                pos = len(stream)
                break
            out.append(stream[pos : m.end()])
            pos = m.end()
            continue
        if not _bi_dict_shaped(stream[m.end() : mid.start()]):
            # the span between this BI and the next ID is not an image
            # dictionary — this "BI" is page text, not an image start
            out.append(stream[pos : m.end()])
            pos = m.end()
            continue
        data_start = mid.end() + 1  # skip the single post-ID whitespace
        mei = _EI_RE.search(stream, data_start)
        if mei is None:
            out.append(stream[pos : m.start()])
            pos = len(stream)
            break
        raw = stream[data_start : mei.start() - 1]
        digest = hashlib.sha1(raw).hexdigest()
        out.append(stream[pos : m.start()])
        out.append(b" /XI" + digest.encode("ascii") + b" INLINEIMG ")
        pos = mei.end()
    out.append(stream[pos:])
    return b"".join(out)


def _run_content(
    stream: bytes,
    xobjects: dict,
    objs: dict[int, _Obj],
    fonts: dict[str, dict] | None = None,
):
    """Yield ('run', y, x, size, text), ('image', y, x, sha1) and
    ('rule', axis, pos, lo, hi) events.

    Rules are the axis-aligned painted path segments table producers
    draw their grid lines with: ``re`` rectangles (a thin one — w or h
    <= 2 units — is itself a single line, the filled-rect rule idiom)
    and ``m``/``l`` polylines, committed by any painting operator
    (S/s/f/F/f*/B/B*/b/b*).  ``n`` ends a path WITHOUT painting (the
    ``W n`` clipping idiom), so clip rectangles never read as rules;
    diagonal segments and curves are dropped (grid lines are
    axis-aligned by construction).
    """
    fonts = fonts or {}
    cur_cmap: dict[int, str] | None = None
    cur_widths: list[float] | None = None
    cur_first = 0
    cur_missing: float | None = None
    cur_cidw: dict[int, float] | None = None
    cur_dw: float | None = None
    size = 12.0
    leading = 0.0
    tc = 0.0  # character spacing (Tc), text-space units per glyph
    tw = 0.0  # word spacing (Tw), applied per ASCII space
    # text LINE matrix: rotation/scale part (ma mb mc md) + origin
    # (lx ly).  Td/TD/T* translate in TEXT space, so their steps rotate
    # with the matrix (ISO 32000 §9.4.2); only Tm sets the full matrix,
    # and plain Td-positioned producers keep the identity rotation.
    ma, mb, mc, md = 1.0, 0.0, 0.0, 1.0
    lx = ly = 0.0  # device-space line origin (e, f)
    tpen = 0.0  # pen offset along the baseline, TEXT-space units
    cm_y = 0.0
    cm_x = 0.0
    gs_stack: list[tuple[float, float]] = []  # q/Q saved cm translation
    stack: list[bytes] = []
    # current path: axis-aligned candidate rule segments, committed on a
    # painting op, discarded on `n` (ISO 32000 §8.5.3) — coordinates
    # carry the prevailing cm translation at construction time
    path_segs: list[tuple] = []
    pen_x = pen_y = 0.0  # path current point (post-cm device space)
    sub_x = sub_y = 0.0  # current subpath start, for the `h` closepath

    def _path_line(x0: float, y0: float, x1: float, y1: float):
        # keep only axis-aligned segments with real extent; store in
        # normalized (lo <= hi) form
        if abs(y1 - y0) <= 0.5 and abs(x1 - x0) > 0.5:
            path_segs.append(
                ("h", (y0 + y1) / 2.0, min(x0, x1), max(x0, x1))
            )
        elif abs(x1 - x0) <= 0.5 and abs(y1 - y0) > 0.5:
            path_segs.append(
                ("v", (x0 + x1) / 2.0, min(y0, y1), max(y0, y1))
            )

    def _translate(txv: float, tyv: float):
        nonlocal lx, ly, tpen
        lx += txv * ma + tyv * mc
        ly += txv * mb + tyv * md
        tpen = 0.0

    def show(text: str, cids: list[int] | None = None):
        nonlocal tpen
        if text:
            # pen advance: real /Widths metrics when the simple font
            # declares them (1/1000-em units) with /MissingWidth from
            # the FontDescriptor for glyphs outside the table, else the
            # half-em estimate; plus the Tc/Tw spacing the producer
            # added (ISO 32000 §9.3.2-3, §9.4.4, §9.8.1) — spacing
            # shifts where SUBSEQUENT runs in this line start, which is
            # what the x-ordered line fold consumes
            fallback = cur_missing if cur_missing is not None else 500.0
            if cids and (cur_cidw is not None or cur_dw is not None):
                # NB: `cids` truthy, not just non-None — a TJ of literal
                # strings under a composite font yields text with ZERO
                # CIDs, and the /W sum over [] would be a zero advance
                # (worse than the half-em estimate it replaced).  A TJ
                # MIXING hex and literal parts undercounts the literal
                # part's advance — documented approximation; producers
                # do not mix encodings within one show in practice.
                # composite-font metrics: per-CID /W advance with /DW
                # for unlisted CIDs (spec default 1000).  Tc applies per
                # GLYPH (CID count, not output-char count: a ligature
                # destination is one glyph); Tw never applies here —
                # word spacing only fires on single-byte code 32, which
                # a 2-byte Identity-H string cannot contain (§9.3.3)
                dw = cur_dw if cur_dw is not None else 1000.0
                glyphs = sum(
                    (cur_cidw or {}).get(c, dw) for c in cids
                )
                adv = glyphs / 1000.0 * size
                spacing = tc * len(cids)
            elif cur_widths is not None and cur_cmap is None:
                glyphs = 0.0
                for ch in text:
                    idx = ord(ch) - cur_first
                    glyphs += (
                        cur_widths[idx]
                        if 0 <= idx < len(cur_widths)
                        else fallback
                    )
                adv = glyphs / 1000.0 * size
                spacing = tc * len(text) + tw * text.count(" ")
            elif cur_missing is not None and cur_cmap is None:
                # no /Widths table at all, but the FontDescriptor
                # declares the substitute advance — better than half-em
                adv = fallback * len(text) / 1000.0 * size
                spacing = tc * len(text) + tw * text.count(" ")
            else:
                adv = 0.5 * size * len(text)
                spacing = tc * len(text) + tw * text.count(" ")
            end_t = tpen + adv + spacing
            # the run carries BOTH its start and estimated end x: the
            # line fold uses the start-vs-previous-end gap to infer
            # inter-word spaces for per-word-positioned producers.
            # The prevailing cm translation applies here too — rules,
            # images and text must live in ONE device frame or a
            # producer drawing its grid and cells under one `q .. cm`
            # translate (Cairo does) would put the grid bbox and the
            # text it must capture in different coordinate spaces
            sx, sy = lx + tpen * ma + cm_x, ly + tpen * mb + cm_y
            ex, ey = lx + end_t * ma + cm_x, ly + end_t * mb + cm_y
            if abs(mb) < 1e-9:
                # horizontal baseline (the identity fast path emits
                # exactly the pre-matrix coordinates)
                yield_events.append(("run", sy, sx, size, text, ex))
            elif abs(ma) < 1e-9:
                # axis-aligned rotated text (90deg: b=1, 270deg: b=-1):
                # the "line" is a vertical column at constant device x.
                # Map into the consumer's (line-y desc, in-line-x asc)
                # order: group key -sx sorts columns left-to-right, and
                # signed y keeps runs in baseline-flow order with gap
                # inference intact
                s = 1.0 if mb > 0 else -1.0
                yield_events.append(("run", -sx, sy * s, size, text, ey * s))
            else:
                # arbitrary rotation: degrade to the run's device
                # anchor (never crash; ordering is best-effort)
                yield_events.append(("run", sy, sx, size, text, ex))
            tpen = end_t

    yield_events: list[tuple] = []
    # inline images leave the stream BEFORE tokenization: their raw
    # sample bytes can contain anything, including operator lookalikes
    stream = _excise_inline_images(stream)
    for tok in _TOK_RE.finditer(stream):
        t = tok.group(0)
        if t in (b"[", b"]"):
            stack.append(t)
            continue
        if (
            t.startswith(b"/")
            or t.startswith(b"(")
            or t.startswith(b"<")
            or re.fullmatch(rb"[-+]?\d*\.?\d+", t)
        ):
            stack.append(t)
            continue
        # operator
        if t == b"Tf" and len(stack) >= 1:
            try:
                size = float(stack[-1])
            except ValueError:
                pass
            if len(stack) >= 2 and stack[-2].startswith(b"/"):
                rec = fonts.get(stack[-2][1:].decode("latin-1"))
                cur_cmap = rec["cmap"] if rec else None
                cur_widths = rec["widths"] if rec else None
                cur_first = rec["first"] if rec else 0
                cur_missing = rec["missing"] if rec else None
                cur_cidw = rec.get("cidw") if rec else None
                cur_dw = rec.get("dw") if rec else None
        elif t in (b"Td", b"TD") and len(stack) >= 2:
            try:
                tx, ty = float(stack[-2]), float(stack[-1])
                _translate(tx, ty)
                if t == b"TD":
                    leading = -ty
            except ValueError:
                pass
        elif t == b"Tm" and len(stack) >= 6:
            try:
                vals = [float(v) for v in stack[-6:]]
                ma, mb, mc, md = vals[0], vals[1], vals[2], vals[3]
                lx, ly = vals[4], vals[5]
                tpen = 0.0
            except ValueError:
                pass
        elif t == b"TL" and stack:
            try:
                leading = float(stack[-1])
            except ValueError:
                pass
        elif t == b"Tc" and stack:
            try:
                tc = float(stack[-1])
            except ValueError:
                pass
        elif t == b"Tw" and stack:
            try:
                tw = float(stack[-1])
            except ValueError:
                pass
        elif t == b"T*":
            _translate(0.0, -leading)
        elif t == b"BT":
            ma, mb, mc, md = 1.0, 0.0, 0.0, 1.0
            lx = ly = tpen = 0.0
        elif t in (b"Tj", b"'", b'"') and stack:
            if t == b'"' and len(stack) >= 3:
                # aw ac string " : set word/char spacing, then behave
                # like ' (next line + show)  — ISO 32000 §9.4.3
                try:
                    tw, tc = float(stack[-3]), float(stack[-2])
                except ValueError:
                    pass
            if t in (b"'", b'"'):
                _translate(0.0, -leading)
            s = stack[-1]
            if s.startswith(b"<") and cur_cmap is not None:
                show(*_decode_with_cmap_cids(s, cur_cmap))
            elif s.startswith(b"(") or s.startswith(b"<"):
                show(_decode_pdf_string(s))
        elif t == b"TJ":
            # consume back to the matching [
            parts: list[str] = []
            tj_cids: list[int] = []
            i = len(stack) - 1
            while i >= 0 and stack[i] != b"[":
                i -= 1
            for el in stack[i + 1 :] if i >= 0 else []:
                if el.startswith(b"<") and cur_cmap is not None:
                    txt, el_cids = _decode_with_cmap_cids(el, cur_cmap)
                    parts.append(txt)
                    tj_cids.extend(el_cids)
                elif el.startswith(b"(") or el.startswith(b"<"):
                    parts.append(_decode_pdf_string(el))
                else:
                    try:
                        if float(el) <= _TJ_SPACE:
                            parts.append(" ")
                    except ValueError:
                        pass
            show(
                "".join(parts),
                tj_cids if cur_cmap is not None else None,
            )
        elif t == b"cm" and len(stack) >= 6:
            # translation-only CTM tracking: `cm` CONCATENATES, so the
            # new offset composes onto the prevailing one (§8.3.4);
            # rotation/scale components are ignored (documented
            # approximation — positioning producers translate)
            try:
                cm_x += float(stack[-2])
                cm_y += float(stack[-1])
            except ValueError:
                pass
        elif t == b"q":
            gs_stack.append((cm_x, cm_y))
        elif t == b"Q":
            if gs_stack:
                cm_x, cm_y = gs_stack.pop()
        elif t == b"re" and len(stack) >= 4:
            try:
                rx, ry, rw, rh = (float(v) for v in stack[-4:])
            except ValueError:
                pass
            else:
                rx, ry = rx + cm_x, ry + cm_y
                # a thin rectangle IS a rule (producers fill 1-unit-high
                # rects as horizontal lines); a full box contributes its
                # four border segments
                if abs(rh) <= 2.0 and abs(rw) > 0.5:
                    path_segs.append(
                        ("h", ry + rh / 2.0,
                         min(rx, rx + rw), max(rx, rx + rw))
                    )
                elif abs(rw) <= 2.0 and abs(rh) > 0.5:
                    path_segs.append(
                        ("v", rx + rw / 2.0,
                         min(ry, ry + rh), max(ry, ry + rh))
                    )
                else:
                    _path_line(rx, ry, rx + rw, ry)
                    _path_line(rx, ry + rh, rx + rw, ry + rh)
                    _path_line(rx, ry, rx, ry + rh)
                    _path_line(rx + rw, ry, rx + rw, ry + rh)
                # `re` also starts a new subpath at (rx, ry) (§8.5.2.1)
                pen_x, pen_y = rx, ry
                sub_x, sub_y = rx, ry
        elif t == b"m" and len(stack) >= 2:
            try:
                pen_x = float(stack[-2]) + cm_x
                pen_y = float(stack[-1]) + cm_y
                sub_x, sub_y = pen_x, pen_y
            except ValueError:
                pass
        elif t == b"l" and len(stack) >= 2:
            try:
                nx = float(stack[-2]) + cm_x
                ny_ = float(stack[-1]) + cm_y
            except ValueError:
                pass
            else:
                _path_line(pen_x, pen_y, nx, ny_)
                pen_x, pen_y = nx, ny_
        elif t in (b"c", b"v", b"y"):
            # curves never form grid lines; just move the current point
            try:
                pen_x = float(stack[-2]) + cm_x
                pen_y = float(stack[-1]) + cm_y
            except (ValueError, IndexError):
                pass
        elif t == b"h":
            _path_line(pen_x, pen_y, sub_x, sub_y)
            pen_x, pen_y = sub_x, sub_y
        elif t in (b"S", b"s", b"f", b"F", b"B", b"b") or t in (
            b"f*", b"B*", b"b*",
        ):
            if t in (b"s", b"b", b"b*"):
                _path_line(pen_x, pen_y, sub_x, sub_y)
            for seg in path_segs:
                yield_events.append(("rule",) + seg)
            path_segs = []
        elif t == b"n":
            path_segs = []
        elif t == b"INLINEIMG" and stack and stack[-1].startswith(b"/XI"):
            # sentinel from _excise_inline_images: the name payload IS
            # the sha1 of the raw sample data (content-addressed like
            # XObject images), positioned by the prevailing cm offset
            digest = stack[-1][3:].decode("ascii")
            if len(digest) == 40:
                yield_events.append(("image", cm_y, cm_x, digest))
        elif t == b"Do" and stack and stack[-1].startswith(b"/"):
            name = stack[-1][1:].decode("latin-1")
            ref = xobjects.get(name)
            obj = (
                objs.get(ref[1])
                if isinstance(ref, tuple) and ref[0] == "ref"
                else None
            )
            if obj is not None and obj.info.get("Subtype") == ("name", "Image"):
                digest = hashlib.sha1(obj.stream or b"").hexdigest()
                yield_events.append(("image", cm_y, cm_x, digest))
        stack.clear()
    return yield_events


def parse_pdf(data: bytes, heading_min_size: float = 16.0) -> list[dict]:
    """Parse PDF bytes into ordered layout spans.

    Returns ``[{kind, text, media_ref, order}, ...]`` in reading order
    (page asc, baseline y desc, x asc).  Raises :class:`PdfError` if the
    bytes are not a PDF at all; individual malformed objects degrade
    leniently.
    """
    if not data.startswith(b"%PDF-"):
        raise PdfError("missing %PDF- header")
    objs = _load_objects(data)
    if not objs:
        raise PdfError("no objects")

    events: list[tuple] = []  # (page, -y, x, payload)
    page_rules: dict[int, list[tuple]] = {}  # painted rule segments
    for pageno, (page, res_val) in enumerate(_page_order(objs)):
        res = _deref_dict(objs, res_val)
        xobjects = _deref_dict(objs, res.get("XObject"))
        fonts: dict[str, dict] = {}
        for fname, fref in _deref_dict(objs, res.get("Font")).items():
            fdict = _deref_dict(objs, fref)
            rec: dict = {
                "cmap": None, "widths": None, "first": 0, "missing": None,
                "cidw": None, "dw": None,
            }
            # Type0 (composite) metrics: the /DescendantFonts CIDFont
            # carries per-CID advances in /W with /DW as the default
            # (ISO 32000 §9.7.4.3) — without them, CMap-encoded text
            # keeps the half-em estimate
            df = fdict.get("DescendantFonts")
            df_arr = _resolve_array(objs, df)
            if df_arr:
                cidfont = _deref_dict(objs, df_arr[0])
                w_arr = _resolve_array(objs, cidfont.get("W"))
                if w_arr:
                    rec["cidw"] = _parse_w_array(w_arr)
                dw = cidfont.get("DW")
                if isinstance(dw, float):
                    rec["dw"] = dw
            # FontDescriptor /MissingWidth (ISO 32000 §9.8.1): the
            # advance for glyphs the /Widths table doesn't cover — and,
            # when a Type1/TrueType font ships a descriptor but no
            # /Widths at all, a better whole-font estimate than half-em
            fd = _deref_dict(objs, fdict.get("FontDescriptor"))
            mw = fd.get("MissingWidth")
            if isinstance(mw, float):
                rec["missing"] = mw
            tu = fdict.get("ToUnicode")
            if isinstance(tu, tuple) and tu[0] == "ref":
                tobj = objs.get(tu[1])
                if tobj is not None and tobj.stream:
                    rec["cmap"] = _parse_tounicode(tobj.stream)
            # simple-font metrics: /Widths (direct or indirect array) +
            # /FirstChar give the real per-glyph advance in 1/1000 em
            w = _resolve_array(objs, fdict.get("Widths"))
            fc = fdict.get("FirstChar")
            # widths are usable ONLY with a resolvable direct /FirstChar:
            # defaulting first=0 would misindex every lookup by the true
            # FirstChar (typically 32) and drift the pen estimate — the
            # half-em fallback is strictly better than wrong metrics
            if (
                w
                and all(isinstance(v, float) for v in w)
                and isinstance(fc, float)
            ):
                rec["widths"] = w
                rec["first"] = int(fc)
            if (
                rec["cmap"] is not None
                or rec["widths"] is not None
                or rec["missing"] is not None
                or rec["cidw"] is not None
                or rec["dw"] is not None
            ):
                fonts[fname] = rec
        # link annotations (the PDF counterpart of the HTML path's link
        # surface, S15): /Annots Link + /A URI actions become 'link'
        # spans positioned by their /Rect top-left corner
        annots = _resolve_array(objs, page.info.get("Annots"))
        if annots:
            for aref in annots:
                a = _deref_dict(objs, aref)
                if a.get("Subtype") != ("name", "Link"):
                    continue
                action = a.get("A")
                if isinstance(action, tuple):
                    action = _deref_dict(objs, action)
                if (
                    not isinstance(action, dict)
                    or action.get("S") != ("name", "URI")
                ):
                    continue
                uri = action.get("URI")
                if not isinstance(uri, str) or not uri:
                    continue
                rect = a.get("Rect")
                x0 = y1 = 0.0
                if (
                    isinstance(rect, list)
                    and len(rect) == 4
                    and all(isinstance(v, float) for v in rect)
                ):
                    x0 = min(rect[0], rect[2])
                    y1 = max(rect[1], rect[3])
                events.append((pageno, -round(y1, 1), x0, ("l", uri)))
        contents = page.info.get("Contents")
        clist = _resolve_array(objs, contents)
        refs = clist if clist is not None else [contents]
        stream = b""
        for ref in refs:
            if isinstance(ref, tuple) and ref[0] == "ref":
                obj = objs.get(ref[1])
                if obj is not None and obj.stream is not None:
                    stream += obj.stream + b"\n"
        for ev in _run_content(stream, xobjects, objs, fonts):
            if ev[0] == "run":
                _, y, x, size, text, end_x = ev
                events.append(
                    (pageno, -round(y, 1), x, ("t", size, text, end_x))
                )
            elif ev[0] == "rule":
                page_rules.setdefault(pageno, []).append(ev[1:])
            else:
                _, y, x, digest = ev
                events.append((pageno, -round(y, 1), x, ("i", digest)))

    # ruled tables: grids detected from painted rules capture the text
    # runs inside their bounding box into one 'table' span (cells read
    # row-major, ` | ` between cells, newline between rows), placed at
    # the grid's top-left.  This runs BEFORE the XY-cut, so a ruled
    # table can no longer fake a column gutter and read column-major —
    # only unruled (whitespace-aligned) tables keep that documented
    # XY-cut-family tradeoff.
    events = _assemble_tables(events, page_rules)

    # column-aware reading order: one optional vertical XY-cut per page
    # (page asc, column asc, baseline y desc, x asc)
    by_page: dict[int, list] = {}
    for e in events:
        by_page.setdefault(e[0], []).append(e)
    splits = {pg: _column_split(evs) for pg, evs in by_page.items()}
    keyed = []
    for page, ny, x, payload in events:
        split = splits[page]
        col = 0 if split is None or x < split else 1
        keyed.append((page, col, ny, x, payload))
    keyed.sort(key=lambda e: e[:4])
    events = keyed

    spans: list[dict] = []

    def flush_line(parts: list[tuple[float, str, float, float]]):
        # gap-aware join (see _join_runs): per-word-positioned
        # producers would otherwise glue the whole line
        text = _join_runs(parts)
        if not text:
            return
        kind = (
            "heading"
            if max(p[0] for p in parts) >= heading_min_size
            else "text"
        )
        spans.append(
            {
                "kind": kind,
                "text": text,
                "media_ref": None,
                "order": len(spans),
            }
        )

    line_key = None
    line_parts: list[tuple[float, str, float, float]] = []
    for page, col, ny, x, payload in events:
        if payload[0] in ("i", "l", "tbl"):
            if line_parts:
                flush_line(line_parts)
                line_parts = []
            line_key = None
            if payload[0] == "tbl":
                spans.append(
                    {
                        "kind": "table",
                        "text": payload[1],
                        "media_ref": None,
                        "order": len(spans),
                    }
                )
                continue
            spans.append(
                {
                    "kind": "image" if payload[0] == "i" else "link",
                    "text": None,
                    "media_ref": (
                        f"pdfimg:{payload[1]}"
                        if payload[0] == "i"
                        else payload[1]
                    ),
                    "order": len(spans),
                }
            )
            continue
        key = (page, col, ny)
        if key != line_key and line_parts:
            flush_line(line_parts)
            line_parts = []
        line_key = key
        line_parts.append((payload[1], payload[2], x, payload[3]))
    if line_parts:
        flush_line(line_parts)
    return spans
