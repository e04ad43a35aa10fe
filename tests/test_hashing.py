from semtools_tpu.utils.hashing import doc_id, fnv1a_64, line_id


def test_fnv1a_known_vectors():
    # Standard FNV-1a 64-bit test vectors
    assert fnv1a_64(b"") == 0xCBF29CE484222325
    assert fnv1a_64(b"a") == 0xAF63DC4C8601EC8C
    assert fnv1a_64(b"foobar") == 0x85944171F73967E8


def test_doc_and_line_ids_are_stable_and_distinct():
    assert doc_id("a/b.txt") == doc_id("a/b.txt")
    assert doc_id("a/b.txt") != doc_id("a/c.txt")
    assert line_id("a/b.txt", 0) != line_id("a/b.txt", 1)
    assert line_id("a/b.txt", 3) == line_id("a/b.txt", 3)
    # line ids must differ from the bare doc id
    assert line_id("a/b.txt", 0) != doc_id("a/b.txt")


def test_line_id_uses_signed_little_endian_line_number():
    # Layout parity with the reference (path bytes + i32 LE line number)
    expected = fnv1a_64(b"p" + (7).to_bytes(4, "little"))
    assert line_id("p", 7) == expected
