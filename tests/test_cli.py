"""CLI surface: flag validation and config-file parity (walt.cpp:130-246,
OptionParser.cpp:279-344)."""

import pytest

from walt_tpu.cli import _apply_config_file, build_map_parser, main_map


def test_invalid_suffix_rejected(tmp_path, my_index):
    with pytest.raises(SystemExit, match="invalid suffix"):
        main_map(["-i", my_index, "-r", "reads.txt", "-o", str(tmp_path / "o")])


def test_bad_index_rejected(tmp_path):
    with pytest.raises(SystemExit, match="bad index file"):
        main_map(["-i", str(tmp_path / "nope.dbindex"), "-r", "r.fq",
                  "-o", str(tmp_path / "o")])


def test_topk_range_rejected(tmp_path, my_index, se_fastq):
    with pytest.raises(SystemExit, match=r"\[2, 300\]"):
        main_map(["-i", my_index, "-r", se_fastq, "-o", str(tmp_path / "o"),
                  "-k", "1"])


def test_mate_count_mismatch_rejected(tmp_path, my_index, se_fastq):
    with pytest.raises(SystemExit, match="unequal number"):
        main_map(["-i", my_index, "-1", se_fastq, "-2", "", "-o",
                  str(tmp_path / "o")])


def test_output_count_rejected(tmp_path, my_index, se_fastq):
    with pytest.raises(SystemExit, match="wrong number of output files"):
        main_map(["-i", my_index, "-r", se_fastq, "-o", "a.mr,b.mr"])


def test_config_file_injects_and_cli_overrides(tmp_path):
    cfg = tmp_path / "cfg"
    cfg.write_text("# comment\nmismatch=3\nsam=true\nb=17\n")
    argv = _apply_config_file(["-config-file", str(cfg), "-m", "5"])
    args, _ = build_map_parser().parse_known_args(argv + ["-i", "x", "-o", "y"])
    assert args.mismatch == 5  # command line wins
    assert args.sam is True
    assert args.bucket == 17


def test_config_file_malformed(tmp_path):
    cfg = tmp_path / "cfg"
    cfg.write_text("mismatch 3\n")
    with pytest.raises(SystemExit, match="malformed"):
        _apply_config_file(["-config-file", str(cfg)])


def test_config_file_missing():
    with pytest.raises(SystemExit, match="cannot open config file"):
        _apply_config_file(["-config-file", "/nonexistent/cfg"])
