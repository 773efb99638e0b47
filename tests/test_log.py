"""Verbosity-levelled stream logger (src/log.h:18-132 + -v flag)."""

import sys

from hhsuite_tpu import log as hhlog
from hhsuite_tpu.cli.args import parse_args
from hhsuite_tpu.constants import Parameters


def test_levels_and_filtering(capsys):
    hhlog.set_level(hhlog.INFO)
    hhlog.info("visible")
    hhlog.debug("hidden")
    err = capsys.readouterr().err
    assert "INFO: visible" in err and "hidden" not in err

    hhlog.set_level(0)
    hhlog.warning("warn-hidden")
    hhlog.error("err-visible")
    err = capsys.readouterr().err
    assert "warn-hidden" not in err and "ERROR: err-visible" in err
    hhlog.set_level(hhlog.INFO)


def test_v_flag_sets_level():
    par = Parameters()
    parse_args(["-v", "4"], par)
    assert par.v == 4 and hhlog.get_level() == 4
    parse_args(["-v", "99"], par)
    assert hhlog.get_level() == hhlog.DEBUG4
    parse_args([], Parameters())      # default restores INFO
    assert hhlog.get_level() == hhlog.INFO
