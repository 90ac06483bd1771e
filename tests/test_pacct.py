"""stages/pacct: acct_v3 decode vs a scalar transliteration of
pacct-format.c's handler (the conformance oracle)."""
import struct

import numpy as np
import pytest

from axosyslog_ray.stages.pacct import (RECORD_SIZE, comp_to_ulong,
                                        make_pacct_record,
                                        parse_pacct_records, read_pacct)


def scalar_comp(x: int) -> int:
    # PACCT_CONVERT_COMP_TO_ULONG transliteration (pacct-format.c:65)
    return (x & 0x1FFF) << (((x >> 13) & 0x7) * 3)


class TestCompDecode:
    def test_matches_scalar_for_all_u16(self):
        xs = np.arange(65536, dtype=np.uint64)
        got = comp_to_ulong(xs)
        for x in (0, 1, 0x1FFF, 0x2000, 0x3FFF, 0x8001, 0xFFFF, 12345):
            assert int(got[x]) == scalar_comp(x)


class TestParse:
    def test_field_renderings(self):
        data = make_pacct_record(
            ac_flag=0x02, ac_tty=1024, ac_exitcode=0, ac_uid=1000,
            ac_gid=100, ac_pid=4242, ac_ppid=1, ac_btime=0x2010,
            ac_etime=1.5, ac_utime=0x1FFF, ac_stime=7, ac_mem=0x4005,
            ac_io=3, ac_comm=b"bash")
        t = parse_pacct_records(data)
        row = {c: t.column(c).to_pylist()[0] for c in t.column_names}
        assert row[".pacct.ac_flag"] == "02"
        assert row[".pacct.ac_uid"] == "1000"
        assert row[".pacct.ac_pid"] == "4242"
        # btime gets the comp decode too (reference quirk)
        assert row[".pacct.ac_btime"] == f"{scalar_comp(0x2010)}.00"
        assert row[".pacct.ac_utime"] == f"{scalar_comp(0x1FFF)}.00"
        assert row[".pacct.ac_mem"] == str(scalar_comp(0x4005))
        # %9.2f keeps the width padding
        assert row[".pacct.ac_etime"] == "     1.50"
        assert row[".pacct.ac_comm"] == "bash"
        assert row["msgformat"] == "linux:pacct"
        assert row["message"] == ""

    def test_comm_without_nul_keeps_16_bytes(self):
        t = parse_pacct_records(make_pacct_record(ac_comm=b"0123456789abcdef"))
        assert t.column(".pacct.ac_comm").to_pylist() == ["0123456789abcdef"]

    def test_comm_interior_nul_strlen(self):
        t = parse_pacct_records(make_pacct_record(ac_comm=b"ab\x00cd"))
        assert t.column(".pacct.ac_comm").to_pylist() == ["ab"]

    def test_bad_version_and_short_tail(self):
        data = (make_pacct_record(ac_comm=b"ok")
                + make_pacct_record(ac_version=2)
                + b"\x01\x02\x03")
        t = parse_pacct_records(data)
        msgs = t.column("message").to_pylist()
        assert msgs[0] == ""
        assert "only the v3 format is supported; version='2'" in msgs[1]
        assert "record too small; rec_size='3', expected_size='64'" in msgs[2]
        assert t.column(".pacct.ac_comm").to_pylist()[0] == "ok"

    def test_multi_record_stream(self):
        data = b"".join(make_pacct_record(ac_pid=i, ac_comm=b"p%d" % i)
                        for i in range(100))
        t = parse_pacct_records(data)
        assert t.num_rows == 100
        assert t.column(".pacct.ac_pid").to_pylist() == [str(i) for i in range(100)]


class TestReadPacct:
    def test_dataset_source(self, ray_session, tmp_path):
        f1 = tmp_path / "a.pacct"
        f2 = tmp_path / "b.pacct"
        f1.write_bytes(b"".join(make_pacct_record(ac_pid=i, ac_comm=b"x")
                                for i in range(10)))
        f2.write_bytes(make_pacct_record(ac_pid=99, ac_comm=b"init"))
        out = read_pacct([str(f1), str(f2)]).to_pandas()
        assert len(out) == 11
        assert set(out[".pacct.ac_comm"]) == {"x", "init"}
