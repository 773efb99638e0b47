"""HHblits: iterative profile search with cs219 prefiltering.

Orchestration parity: HHblits::run (src/hhblits.cpp:1065-1414): per round
-> prefilter (stage-1/2 funnels) -> Viterbi scoring of new entries ->
P-values + composite E-values -> MAC realign -> MSA merge -> next-round
profile.  The prefilter and Viterbi stages run as batched device kernels;
the iterative control loop is host-side.
"""

from __future__ import annotations

import copy
from typing import Dict, List, Optional, Set, Tuple

import numpy as np

from ..constants import MINCOLS_REALIGN, Parameters
from ..core.hit import Hit, HitList
from ..core.hmm import HMM
from ..cs.context_lib import ContextLibrary
from ..matrices import get_ss_matrices, get_substitution_matrix
from .engine import HHDatabase, neutralize_tags, perform_realign
from .prefilter import prefilter_db
from .query import (prepare_query_hmm, prepare_template_hmm,
                    read_query_text)
from .viterbi_search import viterbi_search


def run_hhblits(par: Parameters, query_text: str, db: HHDatabase,
                query_name: str = "query",
                lib: Optional[ContextLibrary] = None):
    """Returns (q, hitlist, qali) after par.num_rounds iterations."""
    from ..core.profile import frequencies_and_transitions
    from .hhblits_merge import merge_hits_to_query

    mats = get_substitution_matrix(par.matrix)
    ss = get_ss_matrices(par.ssa)
    if lib is None:
        lib = ContextLibrary.default_cs219()
    par.dbsize = db.size()

    q, qali, input_format = read_query_text(par, query_text, query_name,
                                            mats)
    if par.notags:
        neutralize_tags(q, mats.pb)

    # cs219 sequences for prefiltering
    cs_names = [e.name for e in db.cs219.entries]
    cs_seqs = [db.cs219.read_bytes(e) for e in db.cs219.entries]

    previous_hits: Set[str] = set()
    premerged_hits: Set[str] = set()
    hitlist = HitList()
    search_counter: Set[str] = set()
    alis: Dict[int, object] = {}     # per-round MSAs for -oalis

    for round_no in range(1, par.num_rounds + 1):
        from .. import log as hhlog
        hhlog.info(f"Iteration {round_no}")
        # premerge budget shrinks once enough hits are merged
        # (hhblits.cpp:1120-1126; mutates par.premerge persistently)
        if par.premerge > 0 and round_no > 1 \
                and len(previous_hits) >= par.premerge:
            par.premerge = 0
        else:
            par.premerge -= len(previous_hits)
        q_tmp = copy.deepcopy(q)
        prepare_query_hmm(par, q, mats, input_format)

        if par.prefilter:
            from ..cs.pseudocounts import get_context_engine
            ctx = get_context_engine(par)
            if ctx is not None:
                ctx.add_context_pseudocounts_prefilter(q_tmp)
            else:
                q_tmp.prepare_pseudocounts(mats.R)
                q_tmp.add_amino_acid_pseudocounts(
                    par.pc_prefilter_nocontext_mode,
                    par.pc_prefilter_nocontext_a,
                    par.pc_prefilter_nocontext_b,
                    par.pc_prefilter_nocontext_c)
            q_tmp.calculate_aa_background(mats.pb)
            new_pairs, old_pairs = prefilter_db(
                par, q_tmp, lib, cs_names, cs_seqs, previous_hits)
            entry_names = [name for (_l, name) in new_pairs]
        else:
            entry_names = [e.name for e in db.cs219.entries]

        search_counter.update(entry_names)
        hitlist.N_searched = len(search_counter)
        if not entry_names:
            break

        templates = []
        for name in entry_names:
            t, fmt = db.get_template_hmm(name, par, mats,
                                         use_global_weights=1)
            prepare_template_hmm(par, q, t, mats, fmt)
            templates.append((name, t))

        hits = viterbi_search(par, q, templates, ss_matrices=ss)
        hitlist.extend(hits)
        hitlist.sort()
        hitlist.calculate_pvalues(q, par.loc, par.ssm, par.ssw)
        if par.prefilter:
            hitlist.calculate_hhblits_evalues(
                q, par.dbsize, par.alphaa, par.alphab, par.alphac,
                par.prefilter_evalue_thresh)

        new_hits = sum(1 for h in hitlist if h.Eval <= par.e)

        q_re = copy.deepcopy(q)

        def get_template(entry):
            t, fmt = db.get_template_hmm(str(entry), par, mats,
                                         use_global_weights=par.wg)
            prepare_template_hmm(par, q_re, t, mats, fmt)
            return t, fmt

        # premerge runs even with -norealign (hhblits.cpp:1262-1264)
        if par.premerge and db.a3m is not None:
            from .engine import premerge_hits

            premerge_hits(par, q_re, qali, hitlist, get_template, db,
                          mats, ss, previous_hits, premerged_hits,
                          MINCOLS_REALIGN)
        if par.realign:
            perform_realign(par, q_re, hitlist, get_template, mats, ss,
                            MINCOLS_REALIGN)
        q.realign_q = q_re

        # q for the hhr writer is the round-start HMM (writeHHRFile uses
        # q_tmp, hhblits.cpp:1816-1822); the merged rebuild below feeds
        # the next round and -oa3m/-opsi/-ohhm outputs
        merge_cond = (round_no < par.num_rounds or par.alnfile
                      or par.psifile or par.hhmfile or par.alisbasename)
        if merge_cond:
            if new_hits > 0:
                merge_hits_to_query(par, qali, hitlist, previous_hits, db,
                                    mats, MINCOLS_REALIGN, premerged_hits)
            qnew = HMM()
            frequencies_and_transitions(qali, qnew, par.wg, par.mark,
                                        par.cons, par.showcons, mats.pb,
                                        mats.Sim)
            if par.notags:
                neutralize_tags(qnew, mats.pb)
            if par.alisbasename:
                alis[round_no] = copy.deepcopy(qali)
        else:
            qnew = q

        last_round = (new_hits == 0 or round_no == par.num_rounds
                      or qnew.Neff_HMM > par.neffmax
                      or qali.N_in >= par.maxseq)
        if last_round:
            break
        q = qnew

        # record good hits as seen
        for h in hitlist:
            if par.already_seen_filter and h.Eval <= par.e:
                base = h.file
                previous_hits.add(f"{base}__{h.irep}")
        hitlist = HitList()

    q.alis = alis
    return q, hitlist, qali
