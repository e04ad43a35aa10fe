"""Parity tests: native C++ runtime vs the pure-Python implementations.

The native library (cpp/grepscan.cpp, cpp/hashtok.cpp) must agree
byte-for-byte with the Python fallbacks it accelerates; these tests build
it via the lazy loader if needed and compare on randomized and edge-case
inputs. Skipped wholesale when no C++ toolchain is available.
"""

from __future__ import annotations

import random
import re
import string

import pytest

from semtools_tpu.models.tokenizer import HashTokenizer, _native_encode_ascii_batch
from semtools_tpu.utils import grepscan, native
from semtools_tpu.utils.text import read_file_text, split_lines

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no toolchain?)"
)


def _py_match_lines(path: str, pattern: str, ignore_case: bool):
    flags = re.IGNORECASE if ignore_case else 0
    compiled = re.compile(pattern, flags)
    return [
        i for i, line in enumerate(split_lines(read_file_text(path)))
        if compiled.search(line)
    ]


CONTENT = (
    "Hello World\n"
    "hello world\n"
    "the quick brown fox\n"
    "line with (parens) and [brackets]\n"
    "tabs\tand\rcarriage\n"
    "numbers 12345 and under_scores\n"
    "last line no newline"
)


@pytest.fixture()
def sample_file(tmp_path):
    p = tmp_path / "sample.txt"
    p.write_text(CONTENT, encoding="utf-8")
    return str(p)


class TestGrepScan:
    def test_literal(self, sample_file):
        assert grepscan.match_lines(sample_file, "hello", False) == [1]
        assert grepscan.match_lines(sample_file, "hello", True) == [0, 1]

    def test_escaped_literal(self, sample_file):
        # re.escape()'d pattern, as the ask tool produces for non-regex input
        pat = re.escape("(parens)")
        assert grepscan.match_lines(sample_file, pat, False) == \
            _py_match_lines(sample_file, pat, False)

    def test_regex(self, sample_file):
        for pat in [r"\bworld\b", r"qu.ck", r"\d+", r"^last", r"newline$", r"a|b"]:
            assert grepscan.match_lines(sample_file, pat, False) == \
                _py_match_lines(sample_file, pat, False), pat

    def test_ignore_case_regex(self, sample_file):
        pat = r"HELLO \w+"
        assert grepscan.match_lines(sample_file, pat, True) == \
            _py_match_lines(sample_file, pat, True)

    def test_crlf_and_trailing_newline(self, tmp_path):
        p = tmp_path / "crlf.txt"
        p.write_bytes(b"alpha\r\nbeta\r\ngamma\n")
        path = str(p)
        # '\r' is stripped before matching, no phantom last line
        assert grepscan.match_lines(path, "beta$", False) == \
            _py_match_lines(path, "beta$", False) == [1]
        assert grepscan.match_lines(path, "a", False) == [0, 1, 2]

    def test_empty_file(self, tmp_path):
        p = tmp_path / "empty.txt"
        p.write_text("")
        assert grepscan.match_lines(str(p), "x", False) == []

    def test_missing_file_errors(self, tmp_path):
        with pytest.raises(ValueError):
            grepscan.match_lines(str(tmp_path / "nope.txt"), "x", False)

    def test_bad_regex_errors(self, sample_file):
        with pytest.raises(ValueError):
            grepscan.match_lines(sample_file, "(unclosed", False)

    def test_randomized_literals(self, tmp_path):
        rng = random.Random(7)
        lines = [
            "".join(rng.choices(string.ascii_letters + string.digits + " .,()[]", k=rng.randint(0, 60)))
            for _ in range(200)
        ]
        p = tmp_path / "rand.txt"
        p.write_text("\n".join(lines) + "\n")
        path = str(p)
        for _ in range(30):
            needle = re.escape("".join(rng.choices(string.ascii_letters + " ().", k=rng.randint(1, 5))))
            for ic in (False, True):
                assert grepscan.match_lines(path, needle, ic) == \
                    _py_match_lines(path, needle, ic), (needle, ic)


class TestHashTok:
    def _parity(self, texts):
        tok = HashTokenizer()
        native_ids = _native_encode_ascii_batch(
            texts, tok.vocab_size, tok.ngram_min, tok.ngram_max
        )
        py_ids = tok._encode_py_batch(texts)
        assert [list(map(int, ids)) for ids in native_ids] == py_ids

    def test_basic(self):
        self._parity(["hello world", "The QUICK brown-fox!", "", "   ", "a"])

    def test_punctuation_and_digits(self):
        self._parity(["x=1+2; print(x)", "a_b_c d3f", "...---...", "\t tab \t"])

    def test_word_length_boundaries(self):
        # ngram emission kicks in strictly above ngram_min chars
        self._parity(["abc", "abcd", "abcde", "ab", "_", "____________"])

    def test_control_char_whitespace(self):
        # \x1c-\x1f count as whitespace for Python's \s; parity must hold
        self._parity(["a\x1cb", "a\x1fb", "a\x0bb"])

    def test_long_word(self):
        self._parity(["x" * 10000, "y" * 3 + " " + "z" * 5000])

    def test_randomized(self):
        rng = random.Random(13)
        alphabet = string.ascii_letters + string.digits + string.punctuation + " \t"
        texts = [
            "".join(rng.choices(alphabet, k=rng.randint(0, 120)))
            for _ in range(100)
        ]
        self._parity(texts)

    def test_encode_batch_routes_non_ascii_to_python(self):
        tok = HashTokenizer()
        texts = ["plain ascii", "héllo wörld", "日本語のテキスト", "mixed é ascii"]
        got = tok.encode_batch(texts)
        assert [list(map(int, ids)) for ids in got] == tok._encode_py_batch(texts)
