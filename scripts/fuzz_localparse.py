"""Fuzz harness for the offline ``local`` parse backend.

The backend's contract (parse/local_backend.py) is per-file failure
isolation: any ``Exception`` a converter raises is wrapped into
``LocalParseError`` and the batch continues.  What that contract cannot
contain — and what this harness hunts — is:

  * hangs (unbounded loops, catastrophic runtime),
  * memory bombs (decompression bombs, crafted size fields),
  * BaseExceptions that escape ``except Exception``.

Method: seed documents per format (valid + adversarial structured
seeds), then mutate them with byte-level and structure-aware operators
under a fixed RNG.  Every case runs with a wall-clock alarm and the
process under an address-space rlimit; a timeout, a MemoryError, or a
non-Exception escape is a finding (saved to ``fuzz_failures/``).

Stdlib-only on purpose: converters are stdlib-only, and importing jax or
numpy here would make the rlimit meaningless.

Usage: python scripts/fuzz_localparse.py [--cases N] [--seed S]
"""

from __future__ import annotations

import argparse
import io
import random
import resource
import signal
import sys
import time
import zipfile
import zlib
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from semtools_tpu.parse.extract import (  # noqa: E402
    docx_to_markdown,
    epub_to_markdown,
    html_to_markdown,
    odt_to_markdown,
    pptx_to_markdown,
    rtf_to_text,
    xlsx_to_markdown,
)
from semtools_tpu.parse.pdftext import pdf_to_text  # noqa: E402

TIMEOUT_S = 10.0
RLIMIT_BYTES = 2 << 30  # 2 GiB: converters bounded far below this


class FuzzTimeout(BaseException):
    """BaseException so converters' ``except Exception`` can't eat it."""


def _alarm(_sig, _frm):
    raise FuzzTimeout()


# ---------------------------------------------------------------------------
# Seeds


def _zip_bytes(members) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in members:
            zf.writestr(name, data)
    return buf.getvalue()


def _docx_seed() -> bytes:
    doc = (
        '<?xml version="1.0"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
        "<w:body>"
        '<w:p><w:pPr><w:pStyle w:val="Heading1"/></w:pPr><w:r><w:t>Title</w:t></w:r></w:p>'
        "<w:p><w:r><w:rPr><w:b/></w:rPr><w:t>bold</w:t></w:r><w:r><w:t> text</w:t></w:r></w:p>"
        "<w:tbl><w:tr><w:tc><w:p><w:r><w:t>a</w:t></w:r></w:p></w:tc>"
        "<w:tc><w:p><w:r><w:t>b</w:t></w:r></w:p></w:tc></w:tr></w:tbl>"
        "</w:body></w:document>"
    )
    return _zip_bytes([("word/document.xml", doc)])


def _pptx_seed() -> bytes:
    slide = (
        '<?xml version="1.0"?>'
        '<p:sld xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main" '
        'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main">'
        '<p:sp><p:ph type="title"/><a:p><a:r><a:t>Slide title</a:t></a:r></a:p></p:sp>'
        "<p:sp><a:p><a:r><a:t>bullet one</a:t></a:r></a:p></p:sp>"
        "</p:sld>"
    )
    return _zip_bytes([("ppt/slides/slide1.xml", slide)])


def _xlsx_seed() -> bytes:
    ns_s = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    ns_r = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    ns_rel = "http://schemas.openxmlformats.org/package/2006/relationships"
    wb = (
        f'<workbook xmlns="{ns_s}" xmlns:r="{ns_r}">'
        f'<sheets><sheet name="S1" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    rels = (
        f'<Relationships xmlns="{ns_rel}">'
        '<Relationship Id="rId1" Target="worksheets/sheet1.xml"/></Relationships>'
    )
    shared = f'<sst xmlns="{ns_s}"><si><t>hello</t></si></sst>'
    sheet = (
        f'<worksheet xmlns="{ns_s}"><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1"><v>42</v></c></row>'
        '<row r="2"><c r="A2" t="inlineStr"><is><t>inline</t></is></c></row>'
        "</sheetData></worksheet>"
    )
    return _zip_bytes([
        ("xl/workbook.xml", wb),
        ("xl/_rels/workbook.xml.rels", rels),
        ("xl/sharedStrings.xml", shared),
        ("xl/worksheets/sheet1.xml", sheet),
    ])


def _pdf_assemble(objects, header=b"%PDF-1.4\n") -> bytes:
    out = bytearray(header)
    for num, body in objects:
        out += b"%d 0 obj\n" % num + body + b"\nendobj\n"
    out += b"%%EOF\n"
    return bytes(out)


def _pdf_seed(compress=False) -> bytes:
    text = b"BT /F1 12 Tf 72 700 Td (Hello fuzz world) Tj ET"
    if compress:
        z = zlib.compress(text)
        stream = b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(z) + z + b"\nendstream"
    else:
        stream = b"<< /Length %d >>\nstream\n" % len(text) + text + b"\nendstream"
    return _pdf_assemble([
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"),
        (4, stream),
    ])


def _pdf_cyclic_kids() -> bytes:
    # Pages node whose Kids include itself and its parent.
    return _pdf_assemble([
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [2 0 R 3 0 R 1 0 R] /Count 99 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"),
        (4, b"<< /Length 2 >>\nstream\nBT\nendstream"),
    ])


def _pdf_ref_cycle() -> bytes:
    # Indirect references that resolve to each other forever.
    return _pdf_assemble([
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"5 0 R"),
        (5, b"2 0 R"),
        (3, b"<< /Type /Page /Contents 5 0 R >>"),
    ])


def _pdf_flate_bomb() -> bytes:
    z = zlib.compress(b"\0" * (512 << 20), 9)  # ~512 MiB of zeros -> ~KBs
    stream = b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(z) + z + b"\nendstream"
    return _pdf_assemble([
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Contents 4 0 R >>"),
        (4, stream),
    ])


def _pdf_predictor_bomb() -> bytes:
    z = zlib.compress(b"\1" + b"\0" * 4096)
    stream = (
        b"<< /Length %d /Filter /FlateDecode "
        b"/DecodeParms << /Predictor 12 /Columns 1073741824 >> >>\nstream\n" % len(z)
        + z + b"\nendstream"
    )
    return _pdf_assemble([
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Contents 4 0 R >>"),
        (4, stream),
    ])


def _xlsx_colref_bomb() -> bytes:
    ns_s = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    ns_r = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    ns_rel = "http://schemas.openxmlformats.org/package/2006/relationships"
    wb = (
        f'<workbook xmlns="{ns_s}" xmlns:r="{ns_r}">'
        f'<sheets><sheet name="S1" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    rels = (
        f'<Relationships xmlns="{ns_rel}">'
        '<Relationship Id="rId1" Target="worksheets/sheet1.xml"/></Relationships>'
    )
    sheet = (
        f'<worksheet xmlns="{ns_s}"><sheetData>'
        '<row r="1"><c r="ZZZZZZ1"><v>1</v></c></row>'
        "</sheetData></worksheet>"
    )
    return _zip_bytes([
        ("xl/workbook.xml", wb),
        ("xl/_rels/workbook.xml.rels", rels),
        ("xl/worksheets/sheet1.xml", sheet),
    ])


def _zip_member_bomb() -> bytes:
    return _zip_bytes([("word/document.xml", b"<w:document>" + b"\0" * (512 << 20))])


def _html_seed() -> bytes:
    return (
        b"<html><head><title>T</title><style>x{}</style></head><body>"
        b"<h1>Header</h1><p>Some <b>bold</b> text with a "
        b'<a href="http://x">link</a>.</p><ul><li>one</li><li>two</li></ul>'
        b"<table><tr><td>a</td><td>b</td></tr></table></body></html>"
    )


def _odt_seed() -> bytes:
    t = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
    o = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"
    tb = "urn:oasis:names:tc:opendocument:xmlns:table:1.0"
    content = (
        f'<office:document-content xmlns:office="{o}" xmlns:text="{t}" '
        f'xmlns:table="{tb}"><office:body><office:text>'
        '<text:h text:outline-level="2">Head</text:h>'
        "<text:p>Body<text:tab/>text<text:s text:c='4'/>here.</text:p>"
        "<text:list><text:list-item><text:p>li</text:p></text:list-item></text:list>"
        "<table:table><table:table-row>"
        "<table:table-cell><text:p>x</text:p></table:table-cell>"
        "</table:table-row></table:table>"
        "</office:text></office:body></office:document-content>"
    )
    return _zip_bytes([("content.xml", content)])


def _epub_seed() -> bytes:
    return _zip_bytes([
        ("META-INF/container.xml",
         '<container xmlns="urn:oasis:names:tc:opendocument:xmlns:container">'
         '<rootfiles><rootfile full-path="OEBPS/content.opf"/></rootfiles></container>'),
        ("OEBPS/content.opf",
         '<package xmlns="http://www.idpf.org/2007/opf"><manifest>'
         '<item id="c1" href="ch1.xhtml"/></manifest>'
         '<spine><itemref idref="c1"/></spine></package>'),
        ("OEBPS/ch1.xhtml",
         "<html><body><h1>T</h1><p>chapter text</p></body></html>"),
    ])


def _rtf_seed() -> bytes:
    return (
        rb"{\rtf1\ansi\deff0 {\fonttbl {\f0 Times;}}"
        rb"{\colortbl;\red0\green0\blue0;}"
        rb"\pard Plain text \b bold\b0 and \'e9 accents \u8364? euro.\par"
        rb"{\*\generator Fuzz 1.0;}}"
    )


SEEDS = {
    "pdf": [_pdf_seed(), _pdf_seed(compress=True), _pdf_cyclic_kids(),
            _pdf_ref_cycle(), _pdf_predictor_bomb()],
    "docx": [_docx_seed()],
    "pptx": [_pptx_seed()],
    "xlsx": [_xlsx_seed(), _xlsx_colref_bomb()],
    "html": [_html_seed()],
    "rtf": [_rtf_seed()],
    "odt": [_odt_seed()],
    "epub": [_epub_seed()],
}

# Built once (expensive): checked as fixed adversarial cases, not mutated.
BOMB_CASES = [
    ("pdf", "flate_bomb", _pdf_flate_bomb),
    ("docx", "zip_member_bomb", _zip_member_bomb),
]

CONVERTERS = {
    "pdf": pdf_to_text,
    "docx": docx_to_markdown,
    "pptx": pptx_to_markdown,
    "xlsx": xlsx_to_markdown,
    "html": lambda b: html_to_markdown(b),
    "rtf": lambda b: rtf_to_text(b),
    "odt": odt_to_markdown,
    "epub": epub_to_markdown,
}


# ---------------------------------------------------------------------------
# Mutators


def _mutate(rng: random.Random, data: bytes) -> bytes:
    ops = rng.randint(1, 4)
    buf = bytearray(data)
    for _ in range(ops):
        if not buf:
            return bytes(buf)
        op = rng.randrange(8)
        if op == 0:  # flip random bytes
            for _ in range(rng.randint(1, 16)):
                i = rng.randrange(len(buf))
                buf[i] = rng.randrange(256)
        elif op == 1:  # truncate
            buf = buf[: rng.randrange(len(buf))]
        elif op == 2:  # delete span
            i = rng.randrange(len(buf))
            j = min(len(buf), i + rng.randint(1, 64))
            del buf[i:j]
        elif op == 3:  # duplicate span
            i = rng.randrange(len(buf))
            j = min(len(buf), i + rng.randint(1, 128))
            buf[i:i] = buf[i:j]
        elif op == 4:  # insert junk
            i = rng.randrange(len(buf) + 1)
            buf[i:i] = bytes(rng.randrange(256) for _ in range(rng.randint(1, 32)))
        elif op == 5:  # blow up an integer literal
            import re as _re

            ints = [m for m in _re.finditer(rb"\d{1,9}", bytes(buf))]
            if ints:
                m = ints[rng.randrange(len(ints))]
                big = str(rng.choice([2**31, 2**63, 10**12, -1, 0])).encode()
                buf[m.start():m.end()] = big
        elif op == 6:  # splice with another seed of the same format
            pass  # handled by caller mixing seeds
        elif op == 7:  # repeat whole tail
            i = rng.randrange(len(buf))
            buf += buf[i:] * rng.randint(1, 3)
        if len(buf) > (4 << 20):
            buf = buf[: 4 << 20]
    return bytes(buf)


# ---------------------------------------------------------------------------
# Runner


def _run_case(fmt: str, data: bytes):
    """Returns (status, detail). status: ok | handled | FINDING-kind."""
    conv = CONVERTERS[fmt]
    signal.setitimer(signal.ITIMER_REAL, TIMEOUT_S)
    t0 = time.perf_counter()
    try:
        out = conv(data)
        if not isinstance(out, str):
            return "finding-type", f"returned {type(out).__name__}"
        return "ok", ""
    except FuzzTimeout:
        return "finding-timeout", f">{TIMEOUT_S}s"
    except MemoryError:
        return "finding-memory", "MemoryError under rlimit"
    except RecursionError as e:
        # Contained by `except Exception`, but flagged: converters should
        # bound their own depth instead of riding the interpreter limit.
        return "finding-recursion", str(e)[:80]
    except Exception:
        return "handled", ""
    except BaseException as e:  # escapes the backend contract
        return "finding-escape", f"{type(e).__name__}: {e}"
    finally:
        signal.setitimer(signal.ITIMER_REAL, 0)
        dt = time.perf_counter() - t0
        if dt > TIMEOUT_S:  # pragma: no cover - alarm should have fired
            print(f"  slow case ({dt:.1f}s) in {fmt}", file=sys.stderr)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", type=int, default=800, help="mutated cases per format")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=str(Path(__file__).parent / "fuzz_failures"))
    args = ap.parse_args()

    try:
        resource.setrlimit(resource.RLIMIT_AS, (RLIMIT_BYTES, RLIMIT_BYTES))
    except (ValueError, OSError):
        pass  # macOS ignores/denies RLIMIT_AS; alarms still bound each case
    signal.signal(signal.SIGALRM, _alarm)
    outdir = Path(args.out)
    rng = random.Random(args.seed)
    t_start = time.perf_counter()

    findings = []
    counts = {"ok": 0, "handled": 0}

    # Fixed adversarial cases first — these must terminate fast.
    for fmt, name, build in BOMB_CASES:
        data = build()
        t0 = time.perf_counter()
        status, detail = _run_case(fmt, data)
        dt = time.perf_counter() - t0
        print(f"[bomb] {fmt}/{name}: {status} ({dt:.2f}s) {detail}")
        if status.startswith("finding"):
            findings.append((fmt, name, status, detail))
        del data

    for fmt, seeds in SEEDS.items():
        for i in range(args.cases):
            base = rng.choice(seeds)
            if rng.random() < 0.1 and len(seeds) > 1:  # splice
                other = rng.choice(seeds)
                cut = rng.randrange(1, len(base))
                base = base[:cut] + other[rng.randrange(len(other)):]
            data = _mutate(rng, base)
            status, detail = _run_case(fmt, data)
            if status.startswith("finding"):
                outdir.mkdir(parents=True, exist_ok=True)
                p = outdir / f"{fmt}_{status}_{args.seed}_{i}.bin"
                p.write_bytes(data)
                findings.append((fmt, str(p), status, detail))
                print(f"[FINDING] {fmt} case {i}: {status} {detail} -> {p}")
            else:
                counts[status] = counts.get(status, 0) + 1

    dt = time.perf_counter() - t_start
    total = sum(counts.values()) + len(findings)
    print(
        f"\n{total} cases in {dt:.1f}s: {counts.get('ok', 0)} ok, "
        f"{counts.get('handled', 0)} handled errors, {len(findings)} findings"
    )
    for f in findings:
        print("  FINDING:", f)
    return 1 if findings else 0


if __name__ == "__main__":
    sys.exit(main())
