"""Local (offline) parse backend: stdlib extractors + backend semantics.

All fixtures are generated in-test (OOXML zips, hand-assembled PDFs) so
the suite stays hermetic. The reference has no offline backend — this is
a capability extension; cache/skip/failure-isolation semantics still
follow src/parse/backend.rs + cache.rs.
"""

import io
import zipfile
import zlib

import pytest

from semtools_tpu.parse.extract import (
    docx_to_markdown,
    html_to_markdown,
    pptx_to_markdown,
    rtf_to_text,
    xlsx_to_markdown,
)
from semtools_tpu.parse.local_backend import (
    LocalParseBackend,
    LocalParseError,
)
from semtools_tpu.parse.pdftext import pdf_to_text

W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
A = "http://schemas.openxmlformats.org/drawingml/2006/main"
P = "http://schemas.openxmlformats.org/presentationml/2006/main"
S = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
REL = "http://schemas.openxmlformats.org/package/2006/relationships"


def _zip(members) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, content in members.items():
            zf.writestr(name, content)
    return buf.getvalue()


# ---------------------------------------------------------------------------
# DOCX


def _docx_bytes() -> bytes:
    doc = f"""<?xml version="1.0"?>
<w:document xmlns:w="{W}" xmlns:r="{R}">
 <w:body>
  <w:p><w:pPr><w:pStyle w:val="Heading1"/></w:pPr>
   <w:r><w:t>Report Title</w:t></w:r></w:p>
  <w:p><w:r><w:t>Plain text with </w:t></w:r>
   <w:r><w:rPr><w:b/></w:rPr><w:t>bold words</w:t></w:r>
   <w:r><w:t xml:space="preserve"> inside.</w:t></w:r></w:p>
  <w:p><w:pPr><w:numPr><w:ilvl w:val="0"/><w:numId w:val="1"/></w:numPr></w:pPr>
   <w:r><w:t>first item</w:t></w:r></w:p>
  <w:p><w:pPr><w:numPr><w:ilvl w:val="1"/><w:numId w:val="1"/></w:numPr></w:pPr>
   <w:r><w:t>nested item</w:t></w:r></w:p>
  <w:p><w:hyperlink r:id="rId9"><w:r><w:t>the docs</w:t></w:r></w:hyperlink></w:p>
  <w:tbl>
   <w:tr><w:tc><w:p><w:r><w:t>name</w:t></w:r></w:p></w:tc>
         <w:tc><w:p><w:r><w:t>value</w:t></w:r></w:p></w:tc></w:tr>
   <w:tr><w:tc><w:p><w:r><w:t>alpha</w:t></w:r></w:p></w:tc>
         <w:tc><w:p><w:r><w:t>1</w:t></w:r></w:p></w:tc></w:tr>
  </w:tbl>
 </w:body>
</w:document>"""
    rels = f"""<?xml version="1.0"?>
<Relationships xmlns="{REL}">
 <Relationship Id="rId9" Type="x" Target="https://example.com/docs"/>
</Relationships>"""
    return _zip({"word/document.xml": doc, "word/_rels/document.xml.rels": rels})


class TestDocx:
    def test_structure(self):
        md = docx_to_markdown(_docx_bytes())
        assert "# Report Title" in md
        assert "**bold words**" in md
        assert "- first item" in md
        assert "  - nested item" in md
        assert "[the docs](https://example.com/docs)" in md
        assert "| name | value |" in md
        assert "| alpha | 1 |" in md

    def test_spacing_preserved_around_bold(self):
        md = docx_to_markdown(_docx_bytes())
        assert "with **bold words** inside." in md


# ---------------------------------------------------------------------------
# PPTX


def _pptx_bytes() -> bytes:
    def slide(title, bullets, with_title=True):
        shapes = []
        if with_title:
            shapes.append(
                f"""<p:sp><p:nvSpPr><p:nvPr><p:ph type="title"/></p:nvPr></p:nvSpPr>
                <p:txBody><a:p><a:r><a:t>{title}</a:t></a:r></a:p></p:txBody></p:sp>"""
            )
        body = "".join(
            f"<a:p><a:r><a:t>{b}</a:t></a:r></a:p>" for b in bullets
        )
        shapes.append(
            f"""<p:sp><p:nvSpPr><p:nvPr><p:ph type="body"/></p:nvPr></p:nvSpPr>
            <p:txBody>{body}</p:txBody></p:sp>"""
        )
        return (
            f'<?xml version="1.0"?><p:sld xmlns:p="{P}" xmlns:a="{A}">'
            f"<p:cSld><p:spTree>{''.join(shapes)}</p:spTree></p:cSld></p:sld>"
        )

    return _zip({
        "ppt/slides/slide1.xml": slide("Intro", ["point one", "point two"]),
        "ppt/slides/slide2.xml": slide("", ["lonely text"], with_title=False),
        # slide10 sorts numerically after slide2, not lexically
        "ppt/slides/slide10.xml": slide("Last", ["the end"]),
    })


class TestPptx:
    def test_slides_in_numeric_order(self):
        md = pptx_to_markdown(_pptx_bytes())
        assert md.index("## Intro") < md.index("## Slide 2") < md.index("## Last")
        assert "- point one" in md and "- the end" in md
        assert "- lonely text" in md


# ---------------------------------------------------------------------------
# XLSX


def _xlsx_bytes() -> bytes:
    shared = (
        f'<?xml version="1.0"?><sst xmlns="{S}">'
        "<si><t>city</t></si><si><t>pop</t></si><si><t>Oslo</t></si></sst>"
    )
    sheet = (
        f'<?xml version="1.0"?><worksheet xmlns="{S}"><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>'
        '<row r="2"><c r="A2" t="s"><v>2</v></c><c r="C2"><v>42</v></c></row>'
        "</sheetData></worksheet>"
    )
    wb = (
        f'<?xml version="1.0"?><workbook xmlns="{S}" xmlns:r="{R}">'
        '<sheets><sheet name="Cities" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    rels = (
        f'<?xml version="1.0"?><Relationships xmlns="{REL}">'
        '<Relationship Id="rId1" Type="x" Target="worksheets/sheet1.xml"/>'
        "</Relationships>"
    )
    return _zip({
        "xl/sharedStrings.xml": shared,
        "xl/worksheets/sheet1.xml": sheet,
        "xl/workbook.xml": wb,
        "xl/_rels/workbook.xml.rels": rels,
    })


class TestXlsx:
    def test_sheet_to_table(self):
        md = xlsx_to_markdown(_xlsx_bytes())
        assert "## Cities" in md
        assert "| city | pop |" in md
        # sparse row: B2 missing, C2 numeric -> gap preserved
        assert "| Oslo |  | 42 |" in md


# ---------------------------------------------------------------------------
# PDF


def _assemble_pdf(objects, header=b"%PDF-1.4\n") -> bytes:
    """objects: list of (num, body bytes incl. any stream)."""
    out = [header]
    for num, body in objects:
        out.append(b"%d 0 obj\n" % num + body + b"\nendobj\n")
    out.append(b"%%EOF\n")
    return b"".join(out)


def _simple_pdf(compress=False) -> bytes:
    content = (
        b"BT /F1 12 Tf 72 720 Td (Hello PDF world) Tj "
        b"0 -14 Td (Second line here) Tj "
        b"[(spa) -250 (ced)] TJ ET"
    )
    if compress:
        raw = zlib.compress(content)
        stream_obj = (
            b"<< /Length 6 0 R /Filter /FlateDecode >>\nstream\n"
            + raw + b"\nendstream"
        )
        extra = [(6, b"%d" % len(raw))]
    else:
        stream_obj = (
            b"<< /Length %d >>\nstream\n" % len(content) + content + b"\nendstream"
        )
        extra = []
    return _assemble_pdf([
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
            b"/Resources << /Font << /F1 5 0 R >> >> >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"),
        (4, stream_obj),
        (5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
    ] + extra)


class TestPdf:
    def test_uncompressed(self):
        text = pdf_to_text(_simple_pdf())
        assert "Hello PDF world" in text
        assert "Second line here" in text
        assert "spa ced" in text  # TJ kerning gap becomes a space
        assert text.index("Hello") < text.index("Second")
        # Td with ty=-14 broke the line
        assert "world\nSecond" in text.replace("  ", " ")

    def test_flate_with_indirect_length(self):
        text = pdf_to_text(_simple_pdf(compress=True))
        assert "Hello PDF world" in text and "Second line here" in text

    def test_multi_page_catalog_order(self):
        def page(n, contents_num):
            return (
                b"<< /Type /Page /Parent 2 0 R /Contents %d 0 R >>" % contents_num
            )

        def stream(s):
            return b"<< /Length %d >>\nstream\nBT /F1 10 Tf (%s) Tj ET\nendstream" % (
                len(s) + 24, s
            )

        # object numbers deliberately reversed vs page order
        data = _assemble_pdf([
            (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
            (2, b"<< /Type /Pages /Kids [9 0 R 3 0 R] /Count 2 "
                b"/Resources << /Font << /F1 5 0 R >> >> >>"),
            (9, page(1, 8)),
            (8, b"<< /Length 35 >>\nstream\nBT /F1 10 Tf (page ONE) Tj ET\nendstream"),
            (3, page(2, 4)),
            (4, b"<< /Length 35 >>\nstream\nBT /F1 10 Tf (page TWO) Tj ET\nendstream"),
            (5, b"<< /Type /Font /Subtype /Type1 >>"),
        ])
        text = pdf_to_text(data)
        assert text.index("page ONE") < text.index("page TWO")
        assert "page ONE\n\npage TWO" in text

    def test_tounicode_cid_font(self):
        cmap = (
            b"/CIDInit /ProcSet findresource begin\n"
            b"begincmap\n"
            b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
            b"2 beginbfchar\n<0001> <0048>\n<0005> <00E9>\nendbfchar\n"
            b"1 beginbfrange\n<0002> <0004> <0061>\nendbfrange\n"
            b"endcmap\nend"
        )
        content = b"BT /F1 12 Tf <00010002000300040005> Tj ET"
        data = _assemble_pdf([
            (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
            (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
            (3, b"<< /Type /Page /Contents 4 0 R "
                b"/Resources << /Font << /F1 5 0 R >> >> >>"),
            (4, b"<< /Length %d >>\nstream\n" % len(content) + content + b"\nendstream"),
            (5, b"<< /Type /Font /Subtype /Type0 /ToUnicode 7 0 R >>"),
            (7, b"<< /Length %d >>\nstream\n" % len(cmap) + cmap + b"\nendstream"),
        ])
        # 0001->H, 0002..0004 -> a,b,c (bfrange), 0005 -> é
        assert pdf_to_text(data) == "Habcé"

    def test_object_stream_pages(self):
        """xref-stream PDFs hide catalog/page dicts in /Type /ObjStm."""
        inner = [
            (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
            (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
            (3, b"<< /Type /Page /Contents 4 0 R >>"),
        ]
        bodies = []
        header = []
        off = 0
        for num, body in inner:
            header.append(b"%d %d" % (num, off))
            bodies.append(body)
            off += len(body) + 1
        payload = b" ".join(header) + b"\n" + b" ".join(bodies)
        first = len(b" ".join(header)) + 1
        raw = zlib.compress(payload)
        content = b"BT (from objstm) Tj ET"
        data = _assemble_pdf([
            (10, b"<< /Type /ObjStm /N 3 /First %d /Length %d /Filter /FlateDecode >>"
                 b"\nstream\n" % (first, len(raw)) + raw + b"\nendstream"),
            (4, b"<< /Length %d >>\nstream\n" % len(content) + content + b"\nendstream"),
        ])
        assert "from objstm" in pdf_to_text(data)

    def test_real_producer_matplotlib(self, tmp_path):
        """Extract text from a PDF written by a real third-party producer
        (matplotlib's pdf backend: compressed streams, TrueType fonts
        with ToUnicode CMaps) — not just our hand-assembled fixtures."""
        mpl = pytest.importorskip("matplotlib")
        mpl.use("pdf")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots()
        ax.set_title("Throughput versus corpus size")
        ax.text(0.3, 0.5, "hello from matplotlib")
        out = tmp_path / "fig.pdf"
        fig.savefig(out)
        plt.close(fig)
        text = pdf_to_text(out.read_bytes())
        assert "hello from matplotlib" in text
        assert "Throughput versus corpus size" in text

    def test_not_a_pdf(self):
        with pytest.raises(ValueError):
            pdf_to_text(b"GIF89a not a pdf")

    def test_tounicode_truncated_bfrange_array(self):
        """A bfrange array destination missing its ']' (reachable via the
        tolerant Flate path on chopped streams) must terminate — this
        looped forever before the end==-1 guard."""
        from semtools_tpu.parse.pdftext import _parse_tounicode

        cmap, codelen = _parse_tounicode(
            b"2 beginbfrange\n"
            b"<0041> <0042> [ <0058> <0059>\n"  # no closing ]
            b"endbfrange"
        )
        assert cmap[0x41] == "X" and cmap[0x42] == "Y"
        assert codelen == 2

    def test_tounicode_astral_bfrange(self):
        """A non-BMP bfrange base decodes to one astral char whose raw
        hex is a surrogate pair; incrementing must happen in code-point
        space (chr(0xD83DDE00) raised OverflowError before)."""
        from semtools_tpu.parse.pdftext import _parse_tounicode

        cmap, _ = _parse_tounicode(
            b"1 beginbfrange\n<0041> <0043> <D83DDE00>\nendbfrange"
        )
        assert cmap[0x41] == "\U0001F600"
        assert cmap[0x43] == "\U0001F602"

    def test_tounicode_out_of_range_increment_degrades(self):
        """Walking past U+10FFFF degrades per-code to the replacement
        char instead of aborting the document."""
        from semtools_tpu.parse.pdftext import _parse_tounicode

        cmap, _ = _parse_tounicode(
            b"1 beginbfrange\n<0000> <0002> <DBFFDFFE>\nendbfrange"  # U+10FFFE
        )
        assert cmap[0x0000] == "\U0010FFFE"
        assert cmap[0x0002] == "�"  # U+110000: out of range

    def test_tounicode_odd_length_hex_dst(self):
        from semtools_tpu.parse.pdftext import _parse_tounicode

        cmap, _ = _parse_tounicode(b"1 beginbfchar\n<0041> <058>\nendbfchar")
        assert cmap[0x41] == "�"

    def test_escapes_in_literal_strings(self):
        content = rb"BT (paren \( close \) back\\slash \110i) Tj ET"
        data = _assemble_pdf([
            (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
            (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
            (3, b"<< /Type /Page /Contents 4 0 R >>"),
            (4, b"<< /Length %d >>\nstream\n" % len(content) + content + b"\nendstream"),
        ])
        text = pdf_to_text(data)
        assert "paren ( close )" in text
        assert "back\\slash" in text
        assert "Hi" in text  # \110 octal = 'H'


# ---------------------------------------------------------------------------
# HTML


class TestHtml:
    def test_structure(self):
        md = html_to_markdown(b"""<!doctype html><html><head>
        <script>var x = "IGNORED";</script><style>p{color:red}</style>
        <title>t</title></head><body>
        <h1>Main Title</h1>
        <p>A paragraph with <strong>bold</strong> and <a href="https://x.y/z">a link</a>.</p>
        <ul><li>one</li><li>two</li></ul>
        <ol><li>first</li><li>second</li></ol>
        <pre>  raw   spaces  </pre>
        <table><tr><th>k</th><th>v</th></tr><tr><td>a</td><td>1</td></tr></table>
        </body></html>""")
        assert "# Main Title" in md
        assert "**bold**" in md
        assert "[a link](https://x.y/z)" in md
        assert "- one" in md and "- two" in md
        assert "1. first" in md and "2. second" in md
        assert "IGNORED" not in md and "color:red" not in md
        assert "  raw   spaces" in md  # pre keeps internal whitespace
        assert "| k | v |" in md and "| a | 1 |" in md

    def test_whitespace_collapse(self):
        md = html_to_markdown(b"<p>lots    of\n\n   space</p>")
        assert "lots of space" in md

    def test_stray_close_anchor_not_reemitted(self):
        """Malformed HTML with an unbalanced </a> must not duplicate the
        previous link's text (link_text is cleared on anchor close)."""
        md = html_to_markdown(b'<p><a href="x">foo</a> bar</a> baz</p>')
        assert md.count("foo") == 1
        assert "bar baz" in md


# ---------------------------------------------------------------------------
# RTF


class TestRtf:
    def test_basic(self):
        rtf = (rb"{\rtf1\ansi{\fonttbl{\f0 Calibri;}}"
               rb"\f0 Hello\par Caf\'e9 time\par \u945?lpha}")
        text = rtf_to_text(rtf)
        assert "Hello" in text
        assert "Café time" in text
        assert "αlpha" in text  # \u945 = α, fallback '?' consumed
        assert "Calibri" not in text  # font table skipped

    def test_starred_destination_skipped(self):
        rtf = rb"{\rtf1 keep {\*\generator Hidden Tool 1.0;}also kept}"
        text = rtf_to_text(rtf)
        assert "keep" in text and "also kept" in text
        assert "Hidden" not in text


# ---------------------------------------------------------------------------
# Backend semantics


class TestLocalBackend:
    def test_parse_cache_and_skip(self, tmp_path, capsys):
        doc = tmp_path / "r.docx"
        doc.write_bytes(_docx_bytes())
        txt = tmp_path / "notes.txt"
        txt.write_text("already readable\n")
        be = LocalParseBackend(cache_dir=str(tmp_path / "cache"))
        results = be.parse_detailed([str(doc), str(txt)])
        assert len(results) == 2
        assert not results[0].was_cached
        assert results[0].output_path.endswith(".md")
        assert "# Report Title" in open(results[0].output_path).read()
        # skip-list passthrough: output path IS the input path
        assert results[1].output_path == str(txt)
        # second run hits the (mtime, size) cache
        again = be.parse_detailed([str(doc)])
        assert again[0].was_cached
        assert again[0].output_path == results[0].output_path

    def test_failure_isolation(self, tmp_path, capsys):
        bad = tmp_path / "broken.docx"
        bad.write_bytes(b"this is not a zip")
        good = tmp_path / "fine.pdf"
        good.write_bytes(_simple_pdf())
        be = LocalParseBackend(cache_dir=str(tmp_path / "cache"))
        results = be.parse_detailed([str(bad), str(good)])
        # bad doc reported on stderr and dropped; batch continues
        assert len(results) == 1
        assert results[0].input_path == str(good)
        assert "Error processing file" in capsys.readouterr().err

    def test_unsupported_extension(self, tmp_path):
        f = tmp_path / "movie.mp4"
        f.write_bytes(b"\x00\x01")
        be = LocalParseBackend(cache_dir=str(tmp_path / "cache"))
        with pytest.raises(LocalParseError, match="not supported"):
            be.convert(str(f))

    def test_all_formats_end_to_end(self, tmp_path):
        files = {
            "a.docx": _docx_bytes(),
            "b.pptx": _pptx_bytes(),
            "c.xlsx": _xlsx_bytes(),
            "d.pdf": _simple_pdf(compress=True),
            "e.html": b"<h1>T</h1><p>body</p>",
            "f.rtf": rb"{\rtf1 rtf body\par}",
        }
        for name, data in files.items():
            (tmp_path / name).write_bytes(data)
        be = LocalParseBackend(cache_dir=str(tmp_path / "cache"))
        results = be.parse(sorted(str(tmp_path / n) for n in files))
        assert len(results) == 6
        for out in results:
            assert open(out).read().strip()


def test_cli_local_backend(tmp_path, monkeypatch, capsys):
    from semtools_tpu import cli

    doc = tmp_path / "deck.pptx"
    doc.write_bytes(_pptx_bytes())
    monkeypatch.setenv("HOME", str(tmp_path))
    rc = cli.main(["parse", "-b", "local", str(doc)])
    out = capsys.readouterr().out.strip()
    assert rc == 0
    assert out.endswith(".md")
    assert "## Intro" in open(out).read()


def test_cli_unknown_backend_lists_both(tmp_path, monkeypatch, capsys):
    from semtools_tpu import cli

    f = tmp_path / "x.pdf"
    f.write_bytes(_simple_pdf())
    monkeypatch.setenv("HOME", str(tmp_path))
    rc = cli.main(["parse", "-b", "bogus", str(f)])
    assert rc == 1
    assert "llama-parse, local" in capsys.readouterr().err


# ---------------------------------------------------------------------------
# Robustness: crafted-input bombs must terminate fast and stay contained
# (found/fixed via scripts/fuzz_localparse.py; the bomb constructions are
# shared with the fuzzer in tests/seeds.py so the two cannot drift)


from tests import seeds


class TestCraftedInputBombs:
    def test_self_referential_kids_terminates(self):
        """A /Kids array listing its own node branches at every level of
        the page-tree walk — ~3^64 visits without the global visit
        budget (the depth cap alone only bounds DEPTH)."""
        import time

        t0 = time.perf_counter()
        text = pdf_to_text(seeds.pdf_cyclic_kids())
        assert time.perf_counter() - t0 < 5.0
        assert "cycle survivor" in text

    def test_flate_bomb_stream_is_skipped(self):
        """A few-KB FlateDecode stream claiming ~512 MiB decoded must not
        be materialized; the stream is skipped, the parse returns."""
        import time

        data = seeds.pdf_flate_bomb()
        assert len(data) < (1 << 20)
        t0 = time.perf_counter()
        pdf_to_text(data)  # no text expected; must return quickly
        assert time.perf_counter() - t0 < 5.0

    def test_filter_chain_depth_capped(self):
        """[Fl Fl Fl ...] chains multiply expansion; chains deeper than
        any legitimate PDF are refused outright."""
        pdf_to_text(seeds.pdf_filter_chain_bomb())  # must not expand

    def test_predictor_giant_columns_no_alloc(self):
        """/DecodeParms /Columns must not size a per-row allocation, and
        giant predicted streams skip the per-byte undo loop."""
        import time

        t0 = time.perf_counter()
        pdf_to_text(seeds.pdf_predictor_bomb())
        assert time.perf_counter() - t0 < 5.0

    def test_zip_member_bomb_contained(self, tmp_path):
        """An OOXML member inflating past the member cap raises inside
        the converter and is isolated per-file by the backend."""
        bomb = seeds.zip_member_bomb(256 << 20)
        with pytest.raises(ValueError, match="decompressed"):
            docx_to_markdown(bomb)
        f = tmp_path / "bomb.docx"
        f.write_bytes(bomb)
        backend = LocalParseBackend(cache_dir=str(tmp_path / "cache"))
        assert backend.parse([str(f)]) == []  # isolated, batch continues

    def test_xlsx_column_ref_bomb_capped(self):
        """A crafted cell ref like ZZZZZZ1 (~300M columns) must not drive
        the row-padding loop; columns clamp at Excel's real maximum."""
        import time

        t0 = time.perf_counter()
        md = xlsx_to_markdown(seeds.xlsx_colref_bomb())
        assert time.perf_counter() - t0 < 5.0
        assert "7" in md

    def test_odt_space_run_length_clamped(self):
        """text:s text:c is attacker-controlled; a giant repeat count
        must not size a string allocation."""
        import time

        from semtools_tpu.parse.extract import odt_to_markdown

        t0 = time.perf_counter()
        md = odt_to_markdown(seeds.odt_space_bomb())
        assert time.perf_counter() - t0 < 5.0
        assert len(md) < 5000 and "a" in md and "b" in md

    def test_shared_stream_charges_decode_budget_once(self):
        """A stream referenced from many pages (ToUnicode CMap, shared
        Contents) must decode once — per-use charging exhausts the
        per-document budget on large LEGITIMATE PDFs and silently drops
        later pages."""
        from semtools_tpu.parse.pdftext import PdfDocument

        payload = zlib.compress(b"BT (shared) Tj ET" + b" " * 60000)
        objects = [
            (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
            (2, b"<< /Type /Pages /Kids [3 0 R 4 0 R 5 0 R] /Count 3 >>"),
            (3, b"<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>"),
            (4, b"<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>"),
            (5, b"<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>"),
            (6, b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(payload)
                + payload + b"\nendstream"),
        ]
        doc = PdfDocument(seeds.assemble_pdf(objects))
        from semtools_tpu.parse.pdftext import Ref

        for _ in range(3):
            assert doc.stream_of(Ref(6)) is not None
        spent = doc.MAX_DECODE_BUDGET - doc._decode_budget
        assert spent < 2 * 60017  # one charge, not three
# ---------------------------------------------------------------------------
# ODT


ODT_T = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
ODT_O = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"
ODT_TB = "urn:oasis:names:tc:opendocument:xmlns:table:1.0"


def _odt_bytes() -> bytes:
    content = (
        f'<office:document-content xmlns:office="{ODT_O}" '
        f'xmlns:text="{ODT_T}" xmlns:table="{ODT_TB}">'
        "<office:body><office:text>"
        '<text:h text:outline-level="1">Report</text:h>'
        "<text:p>First<text:tab/>tabbed and<text:line-break/>broken "
        "with<text:s text:c='3'/>spaces.</text:p>"
        "<text:list><text:list-item><text:p>item one</text:p></text:list-item>"
        "<text:list-item><text:p>item two</text:p></text:list-item></text:list>"
        "<table:table><table:table-row>"
        "<table:table-cell><text:p>a</text:p></table:table-cell>"
        "<table:table-cell><text:p>b</text:p></table:table-cell>"
        "</table:table-row></table:table>"
        "</office:text></office:body></office:document-content>"
    )
    return _zip({"content.xml": content, "mimetype": "application/vnd.oasis.opendocument.text"})


class TestOdt:
    def test_structure(self):
        from semtools_tpu.parse.extract import odt_to_markdown

        md = odt_to_markdown(_odt_bytes())
        assert "# Report" in md
        assert "First\ttabbed" in md
        assert "with   spaces" in md
        assert "- item one" in md and "- item two" in md
        assert "| a | b |" in md

    def test_backend_converts(self, tmp_path):
        doc = tmp_path / "r.odt"
        doc.write_bytes(_odt_bytes())
        backend = LocalParseBackend(cache_dir=str(tmp_path / "c"))
        (out,) = backend.parse([str(doc)])
        assert "# Report" in open(out).read()


# ---------------------------------------------------------------------------
# EPUB


def _epub_bytes(with_opf=True) -> bytes:
    ch1 = b"<html><body><h1>Chapter One</h1><p>It begins.</p></body></html>"
    ch2 = b"<html><body><h1>Chapter Two</h1><p>It ends.</p></body></html>"
    members = {
        # spine lists ch2 before ch1 to prove ORDER comes from the OPF
        "OEBPS/b.xhtml": ch2,
        "OEBPS/a.xhtml": ch1,
    }
    if with_opf:
        members["META-INF/container.xml"] = (
            '<container xmlns="urn:oasis:names:tc:opendocument:xmlns:container">'
            '<rootfiles><rootfile full-path="OEBPS/content.opf"/></rootfiles>'
            "</container>"
        )
        members["OEBPS/content.opf"] = (
            '<package xmlns="http://www.idpf.org/2007/opf">'
            "<manifest>"
            '<item id="c1" href="a.xhtml"/>'
            '<item id="c2" href="b.xhtml"/>'
            "</manifest>"
            '<spine><itemref idref="c1"/><itemref idref="c2"/></spine>'
            "</package>"
        )
    return _zip(members)


class TestEpub:
    def test_spine_order(self):
        from semtools_tpu.parse.extract import epub_to_markdown

        md = epub_to_markdown(_epub_bytes())
        assert md.index("Chapter One") < md.index("Chapter Two")
        assert "It begins." in md and "It ends." in md

    def test_broken_opf_falls_back_to_archive_order(self):
        from semtools_tpu.parse.extract import epub_to_markdown

        md = epub_to_markdown(_epub_bytes(with_opf=False))
        assert "Chapter One" in md and "Chapter Two" in md

    def test_backend_converts(self, tmp_path):
        doc = tmp_path / "book.epub"
        doc.write_bytes(_epub_bytes())
        backend = LocalParseBackend(cache_dir=str(tmp_path / "c"))
        (out,) = backend.parse([str(doc)])
        assert "Chapter One" in open(out).read()

    def test_percent_encoded_hrefs_resolve(self):
        """OPF hrefs are URLs: percent-encoded names (spaces are common
        in real EPUBs) must resolve to their zip members instead of
        silently skipping every chapter."""
        from semtools_tpu.parse.extract import epub_to_markdown

        book = _zip({
            "META-INF/container.xml":
                '<container xmlns="urn:oasis:names:tc:opendocument:xmlns:container">'
                '<rootfiles><rootfile full-path="OEBPS/content.opf"/></rootfiles>'
                "</container>",
            "OEBPS/content.opf":
                '<package xmlns="http://www.idpf.org/2007/opf"><manifest>'
                '<item id="c1" href="my%20ch.xhtml"/>'
                '<item id="c2" href="sub/../ch2.xhtml"/>'
                "</manifest>"
                '<spine><itemref idref="c1"/><itemref idref="c2"/></spine></package>',
            "OEBPS/my ch.xhtml": "<html><body><p>spaced chapter</p></body></html>",
            "OEBPS/ch2.xhtml": "<html><body><p>dotted chapter</p></body></html>",
        })
        md = epub_to_markdown(book)
        assert "spaced chapter" in md and "dotted chapter" in md

    def test_unresolvable_spine_falls_back_to_archive_order(self):
        from semtools_tpu.parse.extract import epub_to_markdown

        book = _zip({
            "META-INF/container.xml":
                '<container xmlns="urn:oasis:names:tc:opendocument:xmlns:container">'
                '<rootfiles><rootfile full-path="OEBPS/content.opf"/></rootfiles>'
                "</container>",
            "OEBPS/content.opf":
                '<package xmlns="http://www.idpf.org/2007/opf"><manifest>'
                '<item id="c1" href="missing.xhtml"/></manifest>'
                '<spine><itemref idref="c1"/></spine></package>',
            "OEBPS/real.xhtml": "<html><body><p>still found</p></body></html>",
        })
        assert "still found" in epub_to_markdown(book)

    def test_one_damaged_chapter_degrades_not_aborts(self):
        """A chapter whose deflate data is corrupt must be skipped; the
        intact chapters still convert."""
        import io as _io
        import zipfile as _zf

        from semtools_tpu.parse.extract import epub_to_markdown

        buf = _io.BytesIO()
        with _zf.ZipFile(buf, "w", _zf.ZIP_DEFLATED) as z:
            z.writestr("OEBPS/a.xhtml", "<html><body><p>good one</p></body></html>")
            z.writestr("OEBPS/b.xhtml", "<html><body><p>doomed</p></body></html>")
            z.writestr("OEBPS/c.xhtml", "<html><body><p>good two</p></body></html>")
        raw = bytearray(buf.getvalue())
        # corrupt b.xhtml's compressed payload in place
        at = bytes(raw).index(b"b.xhtml") + len(b"b.xhtml")
        for i in range(at, at + 8):
            raw[i] ^= 0xFF
        md = epub_to_markdown(bytes(raw))
        assert "good one" in md and "good two" in md and "doomed" not in md
