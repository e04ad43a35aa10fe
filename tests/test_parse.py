"""Parse subsystem tests against a fake LlamaParse server.

The reference ships zero parse tests (SURVEY.md §4); this covers the cache,
skip list, retry/backoff classification, polling, page assembly, and the
concurrency fan-out hermetically.
"""


import pytest

from semtools_tpu.parse import CacheManager, LlamaParseBackend, LlamaParseConfig
from semtools_tpu.parse.client import InvalidResponse, RetryExhausted
from tests.fake_servers import FakeLlamaParse, FakeServer


def make_config(url, **kw):
    defaults = dict(
        api_key="test-key",
        base_url=url,
        check_interval=0.01,
        max_timeout=5.0,
        max_retries=3,
        retry_delay_ms=1.0,
        backoff_multiplier=1.0,
    )
    defaults.update(kw)
    return LlamaParseConfig(**defaults)


@pytest.fixture()
def pdf(tmp_path):
    f = tmp_path / "doc.pdf"
    f.write_bytes(b"%PDF-1.4 fake")
    return str(f)


def backend_for(app, tmp_path, **cfg):
    server = FakeServer(app)  # started by each test's `with server:`
    config = make_config(server.url, **cfg)
    b = LlamaParseBackend(config, cache_dir=str(tmp_path / "cache"))
    return server, b


class TestCacheManager:
    def test_skip_list(self, tmp_path):
        cm = CacheManager(str(tmp_path))
        for ext in ("txt", "md", "py", "rs", "yaml"):
            f = tmp_path / f"x.{ext}"
            f.write_text("hi")
            assert cm.should_skip_file(str(f))
        f = tmp_path / "x.pdf"
        f.write_bytes(b"pdf")
        assert not cm.should_skip_file(str(f))
        assert cm.should_skip_file(str(tmp_path / "missing.pdf"))

    def test_cache_roundtrip_and_invalidation(self, tmp_path, pdf):
        cm = CacheManager(str(tmp_path / "c"))
        assert cm.get_cached_result(pdf) is None
        out = cm.write_results_to_disk(pdf, "# md")
        assert cm.get_cached_result(pdf) == out
        # size change invalidates
        with open(pdf, "ab") as f:
            f.write(b"more")
        assert cm.get_cached_result(pdf) is None

    def test_same_basename_different_dirs_do_not_collide(self, tmp_path):
        # the reference's basename-only keying bug (cache.rs:96-97), fixed here
        d1, d2 = tmp_path / "d1", tmp_path / "d2"
        d1.mkdir(), d2.mkdir()
        f1, f2 = d1 / "r.pdf", d2 / "r.pdf"
        f1.write_bytes(b"one")
        f2.write_bytes(b"two")
        cm = CacheManager(str(tmp_path / "c"))
        p1 = cm.write_results_to_disk(str(f1), "ONE")
        p2 = cm.write_results_to_disk(str(f2), "TWO")
        assert p1 != p2
        assert open(p1).read() == "ONE"
        assert open(p2).read() == "TWO"

    def test_backends_do_not_share_entries(self, tmp_path, pdf):
        """One backend's cached output must never be served as another's:
        a local extraction of scan.pdf followed by a cloud parse (or the
        reverse) must miss, and the two .md outputs must not clobber."""
        cloud = CacheManager(str(tmp_path / "c"))
        local = CacheManager(str(tmp_path / "c"), backend="local")
        p_local = local.write_results_to_disk(pdf, "LOCAL")
        assert cloud.get_cached_result(pdf) is None
        p_cloud = cloud.write_results_to_disk(pdf, "CLOUD")
        assert p_local != p_cloud
        assert local.get_cached_result(pdf) == p_local
        assert cloud.get_cached_result(pdf) == p_cloud
        assert open(p_local).read() == "LOCAL"

    def test_legacy_entry_without_backend_field_serves_cloud(self, tmp_path, pdf):
        """Reference-era metadata (no 'backend' key) stays valid for the
        default llama-parse backend only."""
        import json

        cloud = CacheManager(str(tmp_path / "c"))
        out = cloud.write_results_to_disk(pdf, "OLD")
        meta_path = cloud.metadata_path_for(pdf)
        meta = json.loads(meta_path.read_text())
        del meta["backend"]
        meta_path.write_text(json.dumps(meta))
        assert cloud.get_cached_result(pdf) == out
        assert CacheManager(str(tmp_path / "c"), backend="local").get_cached_result(pdf) is None


class TestBackend:
    def test_parse_uploads_and_polls(self, tmp_path, pdf):
        server, backend = backend_for(FakeLlamaParse(pending_polls=2), tmp_path)
        with server:
            results = backend.parse([pdf])
        assert len(results) == 1
        assert open(results[0]).read().startswith("# Parsed")

    def test_cached_second_run_hits_no_network(self, tmp_path, pdf):
        app = FakeLlamaParse()
        server, backend = backend_for(app, tmp_path)
        with server:
            backend.parse([pdf])
            n_requests = len(app.requests)
            detailed = backend.parse_detailed([pdf])
        assert len(app.requests) == n_requests  # no new HTTP traffic
        assert detailed[0].was_cached

    def test_text_files_pass_through(self, tmp_path):
        f = tmp_path / "notes.txt"
        f.write_text("already readable")
        app = FakeLlamaParse()
        server, backend = backend_for(app, tmp_path)
        with server:
            results = backend.parse([str(f)])
        assert results == [str(f)]
        assert app.requests == []

    def test_retry_on_5xx_then_success(self, tmp_path, pdf):
        app = FakeLlamaParse(fail_uploads=2)
        server, backend = backend_for(app, tmp_path)
        with server:
            results = backend.parse([pdf])
        assert len(results) == 1
        assert app.upload_attempts == 3

    def test_retry_exhaustion(self, tmp_path, pdf):
        app = FakeLlamaParse(fail_uploads=99)
        server, backend = backend_for(app, tmp_path, max_retries=2)
        client = backend.client
        with server:
            with pytest.raises(RetryExhausted):
                client.create_parse_job(pdf, backend.config.base_url, "k", backend.config)

    def test_failed_job_status(self, tmp_path, pdf):
        app = FakeLlamaParse(job_status="FAILED")
        server, backend = backend_for(app, tmp_path)
        with server:
            results = backend.parse([pdf])  # error printed, file dropped
        assert results == []

    def test_per_page_failure_skipped(self, tmp_path, pdf, capsys):
        app = FakeLlamaParse(markdown_pages=["P1", "P2"], failed_page=True)
        server, backend = backend_for(app, tmp_path)
        with server:
            results = backend.parse([pdf])
        content = open(results[0]).read()
        assert "P2" in content and "P1" not in content
        assert "ocr exploded" in capsys.readouterr().err

    def test_4xx_is_terminal(self, tmp_path, pdf):
        class Bad(FakeLlamaParse):
            def handle(self, method, path, headers, body):
                return 401, {"error": "bad key"}

        server, backend = backend_for(Bad(), tmp_path)
        with server:
            with pytest.raises(InvalidResponse):
                backend.client.create_parse_job(
                    pdf, backend.config.base_url, "k", backend.config
                )

    def test_many_files_fan_out(self, tmp_path):
        files = []
        for i in range(7):
            f = tmp_path / f"f{i}.pdf"
            f.write_bytes(b"%PDF" + bytes([i]))
            files.append(str(f))
        app = FakeLlamaParse()
        server, backend = backend_for(app, tmp_path)
        with server:
            results = backend.parse(files)
        assert len(results) == 7
        assert app.next_job == 7


class TestExampleConfig:
    """The shipped example_semtools_config.json must load through both
    config loaders and carry the full parse_kwargs surface into the
    upload configuration (reference example_semtools_config.json)."""

    def test_example_config_loads(self):
        import json
        from pathlib import Path

        from semtools_tpu.ask.config import ApiMode, load_ask_config
        from semtools_tpu.parse.config import load_parse_config

        example = Path(__file__).resolve().parents[1] / "example_semtools_config.json"
        pc = load_parse_config(str(example))
        assert pc.num_ongoing_requests == 10
        assert pc.base_url == "https://api.cloud.llamaindex.ai"
        assert pc.parse_kwargs["tier"] == "cost_effective"
        assert pc.parse_kwargs["processing_options"]["ocr_parameters"]["languages"] == ["en", "de"]
        assert pc.parse_kwargs["output_options"]["markdown"]["tables"]["output_tables_as_markdown"] is True
        assert pc.parse_kwargs["processing_control"]["job_failure_conditions"]["allowed_page_failure_ratio"] == 0.05
        ac = load_ask_config(str(example))
        assert ac.model == "gpt-4o-mini"
        assert ac.max_iterations == 20
        assert ac.api_mode == ApiMode.RESPONSES
        # the raw file is valid JSON with exactly the two documented sections
        data = json.loads(example.read_text())
        assert set(data) == {"parse", "ask"}

    def test_example_parse_kwargs_reach_the_upload(self, tmp_path, pdf):
        from pathlib import Path

        from semtools_tpu.parse.config import load_parse_config

        example = Path(__file__).resolve().parents[1] / "example_semtools_config.json"
        kw = load_parse_config(str(example)).parse_kwargs
        app = FakeLlamaParse()
        server, backend = backend_for(app, tmp_path, parse_kwargs=kw)
        with server:
            backend.parse([pdf])
        sent = app.configurations[0]
        assert sent["tier"] == "cost_effective"
        assert sent["processing_options"]["ocr_parameters"]["languages"] == ["en", "de"]
