"""Every flag the reference hhblits parser accepts must be handled.

The flag list below is the complete set recognized by ProcessArguments
(src/hhblits.cpp:414-820), extracted mechanically from its strcmp /
strncmp calls.  A flag "handled" means parse_args consumes it without
emitting the "ignoring unknown option" warning; value flags get a
plausible value and must land on the right Parameters field.
"""

import contextlib
import io

import pytest

from hhsuite_tpu.cli.args import parse_args
from hhsuite_tpu.constants import Parameters

# flag -> example value (None = boolean flag) — src/hhblits.cpp:414-820
REFERENCE_FLAGS = {
    "-i": "q.a3m", "-d": "db", "-o": "out.hhr", "-oa3m": "o.a3m",
    "-ohhm": "o.hhm", "-opsi": "o.psi", "-blasttab": "o.m8",
    "-scores": "o.scores", "-atab": "o.atab", "-omat": "o.omat",
    "-oalis": "ali", "-Ofas": "o.fas", "-Oa2m": "o.a2m",
    "-Oa3m": "po.a3m", "-n": "2", "-v": "2", "-p": "20", "-E": "1e6",
    "-e": "0.001", "-b": "10", "-B": "500", "-z": "10", "-Z": "500",
    "-seq": "1", "-aliw": "80", "-id": "90", "-qid": "0", "-qsc": "-20",
    "-cov": "0", "-diff": "1000", "-all": None, "-nodiff": None,
    "-neffmax": "10", "-neff": "5", "-Neff": "5", "-M": "a3m",
    "-shift": "-0.03", "-corr": "0.1", "-ssm": "2", "-ssw": "0.11",
    "-ssa": "1.0", "-mact": "0.35", "-mapt": "0.35", "-sc": "1",
    "-scwin": "40", "-cpu": "2", "-maxres": "20001", "-maxseq": "65535",
    "-maxmem": "3", "-maxfilt": "20000", "-realign_max": "500",
    "-alt": "2", "-smin": "20", "-gapb": "1", "-gapd": "0.15",
    "-gape": "1.0", "-gapf": "0.6", "-gapg": "0.6", "-gaph": "0.6",
    "-gapi": "0.6", "-egq": "0", "-egt": "0", "-alphaa": "0.4",
    "-alphab": "0.02", "-alphac": "0.1", "-noprefilt": None,
    "-noaddfilter": None, "-min_prefilter_hits": "100",
    "-prepre_smax_thresh": "10", "-pre_evalue_thresh": "1000",
    "-pre_bitfactor": "4", "-pre_gap_open": "20",
    "-pre_gap_extend": "4", "-pre_score_offset": "50",
    "-realign_old_hits": None, "-realign": None, "-norealign": None,
    "-wg": None, "-glob": None, "-loc": None, "-premerge": "3",
    "-nocontxt": None, "-csb": "0.85", "-csw": "1.6", "-ovlp": "0",
    "-tags": None, "-notags": None, "-interim_filter": "FULL",
    "-hide_cons": None, "-hide_pred": None, "-hide_dssp": None,
    "-show_ssconf": None, "-mark": None, "-add_cons": None,
    "-BLOSUM62": None, "-Blosum62": None, "-contxt": "ctx.crf",
    "-context_data": "ctx.lib", "-cslib": "cs.lib", "-cs_lib": "cs.lib",
    "-pc_hhm_contxt_mode": "2", "-pc_hhm_contxt_a": "0.9",
    "-pc_hhm_contxt_b": "4.0", "-pc_hhm_contxt_c": "1.0",
    "-pc_hhm_nocontxt_mode": "2", "-pc_hhm_nocontxt_a": "1.0",
    "-pc_hhm_nocontxt_b": "1.5", "-pc_hhm_nocontxt_c": "1.0",
    "-pc_prefilter_contxt_mode": "3", "-pc_prefilter_contxt_a": "0.8",
    "-pc_prefilter_contxt_b": "2.0", "-pc_prefilter_contxt_c": "1.0",
    "-pc_prefilter_nocontxt_mode": "2", "-pc_prefilter_nocontxt_a": "1.0",
    "-pc_prefilter_nocontxt_b": "1.5", "-pc_prefilter_nocontxt_c": "1.0",
    "-filter_matrices": None,
    # hhalign/hhsearch-only flags (hhalign.cpp / hhsearch.cpp parsers)
    "-t": "t.a3m", "-excl": "3-57", "-template_excl": "3-57",
    "-aa3m": "app.a3m", "-apsi": "app.psi", "-index": "idx",
    "-dbstrlen": "200", "-Gonnet": None, "-Blosum50": None,
}


@pytest.mark.parametrize("flag", sorted(REFERENCE_FLAGS))
def test_reference_flag_is_parsed(flag):
    value = REFERENCE_FLAGS[flag]
    argv = [flag] if value is None else [flag, value]
    par = Parameters.hhblits_defaults()
    err = io.StringIO()
    with contextlib.redirect_stderr(err):
        parse_args(argv, par)
    assert "ignoring unknown option" not in err.getvalue(), \
        f"{flag} not handled: {err.getvalue()}"


def test_value_flags_reach_parameters():
    par = Parameters.hhblits_defaults()
    parse_args(["-alphaa", "0.5", "-alphab", "0.03", "-alphac", "0.2",
                "-egq", "1.5", "-egt", "2.5", "-pre_bitfactor", "8",
                "-pre_gap_open", "10", "-pre_gap_extend", "2",
                "-pre_score_offset", "40", "-prepre_smax_thresh", "12",
                "-ovlp", "5", "-csb", "0.9", "-csw", "2.0",
                "-sc", "3", "-ssa", "0.5", "-wg",
                "-pc_prefilter_nocontxt_a", "0.7"], par)
    assert par.alphaa == 0.5 and par.alphab == 0.03 and par.alphac == 0.2
    assert par.egq == 1.5 and par.egt == 2.5
    assert par.prefilter_bit_factor == 8
    assert par.prefilter_gap_open == 10
    assert par.prefilter_gap_extend == 2
    assert par.prefilter_score_offset == 40
    assert par.preprefilter_smax_thresh == 12
    assert par.min_overlap == 5
    assert par.csb == 0.9 and par.csw == 2.0
    assert par.columnscore == 3 and par.ssa == 0.5 and par.wg == 1


def test_special_flag_semantics():
    par = Parameters.hhblits_defaults()
    parse_args(["-noprefilt"], par)
    assert par.prefilter is False and par.already_seen_filter is False

    par = Parameters.hhblits_defaults()
    parse_args(["-glob"], par)
    assert par.loc == 0 and par.mact == 0.0   # hhblits.cpp:712-717

    par = Parameters.hhblits_defaults()
    parse_args(["-mact", "0.2", "-glob"], par)
    assert par.mact == 0.2                    # only default mact is reset

    par = Parameters.hhblits_defaults()
    parse_args(["-BLOSUM62"], par)
    assert par.matrix == 62
    parse_args(["-Blosum30"], par)
    assert par.matrix == 30

    par = Parameters.hhblits_defaults()
    parse_args(["-interim_filter", "NONE"], par)
    assert par.interim_filter == 0
    parse_args(["-interim_filter", "FULL"], par)
    assert par.interim_filter == 1

    par = Parameters.hhblits_defaults()
    parse_args(["-scwin", "30"], par)
    assert par.columnscore == 5
    assert par.half_window_size_local_aa_bg_freqs == 30

    par = Parameters.hhblits_defaults()
    parse_args(["-hide_cons", "-hide_pred", "-hide_dssp",
                "-show_ssconf"], par)
    assert par.showcons == 0 and par.showpred == 0
    assert par.showdssp == 0 and par.showconf == 1

    par = Parameters.hhblits_defaults()
    parse_args(["-nodiff"], par)
    assert par.allseqs is True
