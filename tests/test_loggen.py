"""loggen analogue: line shapes parse through the engine's own sources."""
import pyarrow as pa

from axosyslog_ray.loggen import build_line, main


class TestLines:
    def test_rfc3164_shape_and_size(self):
        ln = build_line(7, 1700000000, "2007-12-24T12:28:51", 256,
                        False, "-", False)
        assert len(ln) == 256 and ln.endswith("\n")
        assert ln.startswith("<38>2007-12-24T12:28:51 localhost "
                             "prg00000[1234]: seq: 0000000007,")
        assert "PADD" in ln

    def test_rfc5424_shape(self):
        ln = build_line(0, 1, "2007-12-24T12:28:51", 300, True,
                        '[test name="x"]', False)
        assert ln.startswith('<38>1 2007-12-24T12:28:51+02:00 localhost '
                             'prg00000 1234 - [test name="x"] \ufeffseq:')
        # size accounting is in BYTES: the BOM is EF BB BF on the wire
        assert len(ln.encode("utf-8")) == 300
        assert b"\xef\xbb\xbf" in ln.encode("utf-8")

    def test_framing_octet_count_is_byte_exact(self):
        ln = build_line(0, 1, "2007-12-24T12:28:51", 256, True, "-", True)
        pfx, rest = ln.split(" ", 1)
        assert int(pfx) == len(rest.encode("utf-8"))

    def test_framing_prefix(self):
        ln = build_line(0, 1, "2007-12-24T12:28:51", 200, False, "-", True)
        assert ln.startswith("200 <38>")

    def test_too_small_size_errors(self):
        import pytest
        with pytest.raises(ValueError, match="minimum"):
            build_line(0, 1, "2007-12-24T12:28:51", 50, False, "-", False)

    def test_output_parses_through_engine_syslog(self, tmp_path):
        from axosyslog_ray.stages.syslog import parse_syslog_table
        # RFC3164 shape (ISO stamp in the legacy date position)
        p3 = tmp_path / "gen3164.log"
        assert main(["--number", "5", "--size", "200", str(p3)]) == 0
        t3 = pa.table({"__raw": pa.array(p3.read_text().splitlines())})
        out3 = parse_syslog_table(t3, col="__raw")
        assert set(out3.column("program").to_pylist()) == {"prg00000"}
        assert set(out3.column("host").to_pylist()) == {"localhost"}
        p = tmp_path / "gen.log"
        assert main(["--number", "25", "--size", "300", "--syslog-proto",
                     str(p)]) == 0
        lines = p.read_text().splitlines()
        assert len(lines) == 25
        t = pa.table({"__raw": pa.array(lines)})
        out = parse_syslog_table(t, col="__raw")
        assert set(out.column("program").to_pylist()) == {"prg00000"}
        assert out.column("pri").to_pylist() == [38] * 25
        assert set(out.column("host").to_pylist()) == {"localhost"}
