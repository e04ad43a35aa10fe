"""Build the arXiv benchmark dataset (network required).

Fetches recent paper metadata from the arXiv Atom API, downloads each
paper's full text (HTML rendition, tags stripped; falls back to the
abstract when no HTML is served), and lays the corpus out along the four
axes the benchmark questions exercise: full_text/, by_author/,
by_category/, by_date/.

Stdlib-only (urllib + xml.etree), deliberately gentle on arXiv: one
metadata page per request, 3s between requests, resumable (existing files
are skipped).

Usage:
    python download_arxiv_files.py out_dir --papers 1000 \
        --categories cs.AI cs.LG cs.CL cs.CV
"""

from __future__ import annotations

import argparse
import re
import time
import urllib.request
import xml.etree.ElementTree as ET
from dataclasses import dataclass
from html.parser import HTMLParser
from pathlib import Path
from typing import List

API = "http://export.arxiv.org/api/query"
ATOM = "{http://www.w3.org/2005/Atom}"
ARXIV = "{http://arxiv.org/schemas/atom}"
PAGE = 100
DELAY_S = 3.0
UA = {"User-Agent": "semtools-tpu-benchmark/0.1 (research dataset builder)"}


@dataclass
class Paper:
    arxiv_id: str  # e.g. 2505.12345v2
    title: str
    authors: List[str]
    category: str
    published: str  # YYYY-MM
    abstract: str


class _TextExtractor(HTMLParser):
    """Strips tags; drops script/style/math content."""

    SKIP = {"script", "style", "svg", "math"}

    def __init__(self):
        super().__init__()
        self.parts: List[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in self.SKIP:
            self._skip_depth += 1

    def handle_endtag(self, tag):
        if tag in self.SKIP and self._skip_depth:
            self._skip_depth -= 1

    def handle_data(self, data):
        if not self._skip_depth and data.strip():
            self.parts.append(data.strip())


def _get(url: str) -> bytes:
    req = urllib.request.Request(url, headers=UA)
    with urllib.request.urlopen(req, timeout=60) as resp:
        return resp.read()


def fetch_metadata(categories: List[str], n: int) -> List[Paper]:
    query = "+OR+".join(f"cat:{c}" for c in categories)
    papers: List[Paper] = []
    start = 0
    while len(papers) < n:
        url = (f"{API}?search_query={query}&start={start}&max_results={PAGE}"
               f"&sortBy=submittedDate&sortOrder=descending")
        root = ET.fromstring(_get(url))
        entries = root.findall(f"{ATOM}entry")
        if not entries:
            break
        for e in entries:
            raw_id = e.findtext(f"{ATOM}id", "")
            m = re.search(r"abs/([0-9.]+v\d+)", raw_id)
            if not m:
                continue
            cat_el = e.find(f"{ARXIV}primary_category")
            papers.append(Paper(
                arxiv_id=m.group(1),
                title=" ".join((e.findtext(f"{ATOM}title") or "").split()),
                authors=[a.findtext(f"{ATOM}name", "").strip()
                         for a in e.findall(f"{ATOM}author")],
                category=cat_el.get("term", "unknown") if cat_el is not None else "unknown",
                published=(e.findtext(f"{ATOM}published") or "")[:7],
                abstract=" ".join((e.findtext(f"{ATOM}summary") or "").split()),
            ))
        start += PAGE
        time.sleep(DELAY_S)
    return papers[:n]


def fetch_fulltext(paper: Paper) -> str:
    """Full text via the HTML rendition; abstract-only fallback."""
    try:
        html = _get(f"https://arxiv.org/html/{paper.arxiv_id}").decode("utf-8", "replace")
        ex = _TextExtractor()
        ex.feed(html)
        text = "\n".join(ex.parts)
        if len(text) > 2000:
            return text
    except Exception:
        pass
    return f"{paper.title}\n\n{paper.abstract}\n"


def _safe(name: str) -> str:
    return re.sub(r"[^\w.-]", "_", name)


def build_dataset(out: Path, papers: List[Paper]) -> None:
    for i, p in enumerate(papers):
        flat = out / "full_text" / f"{p.arxiv_id}.txt"
        if flat.exists():
            continue
        text = fetch_fulltext(p)
        flat.parent.mkdir(parents=True, exist_ok=True)
        flat.write_text(text)
        for author in p.authors:
            d = out / "by_author" / _safe(author)
            d.mkdir(parents=True, exist_ok=True)
            (d / f"{p.arxiv_id}_fulltext.txt").write_text(text)
        d = out / "by_category" / _safe(p.category)
        d.mkdir(parents=True, exist_ok=True)
        (d / f"{p.arxiv_id}_fulltext.txt").write_text(text)
        d = out / "by_date" / (p.published or "unknown")
        d.mkdir(parents=True, exist_ok=True)
        (d / f"{p.arxiv_id}_fulltext.txt").write_text(text)
        print(f"[{i + 1}/{len(papers)}] {p.arxiv_id} {p.title[:60]}")
        time.sleep(DELAY_S)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir", type=Path)
    ap.add_argument("--papers", type=int, default=1000)
    ap.add_argument("--categories", nargs="+",
                    default=["cs.AI", "cs.LG", "cs.CL", "cs.CV"])
    args = ap.parse_args()
    print(f"fetching metadata for {args.papers} papers ...")
    papers = fetch_metadata(args.categories, args.papers)
    print(f"got {len(papers)}; downloading full text ...")
    build_dataset(args.out_dir, papers)


if __name__ == "__main__":
    main()
