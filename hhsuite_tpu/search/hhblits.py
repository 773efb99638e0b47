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
from ..profiling import gc_paused_fn
from .engine import HHDatabase, neutralize_tags, perform_realign
from .prefilter import prefilter_db
from .query import (finish_template_hmm, prepare_query_hmm,
                    prepare_template_hmm, read_query_text)
from .viterbi_search import promote_light_hits, viterbi_search


def rescore_previous_hits(par: Parameters, q: HMM, db: HHDatabase,
                          mats, ss, previous_hits: Dict[str, Hit],
                          hitlist: HitList):
    """HHblits::RescoreWithViterbiKeepAlignment (hhblits.cpp:911-968).

    Runs a full Viterbi pass on the templates of all previously found
    irep-1 hits against the current query profile, then pushes the OLD
    hit objects (alignments preserved) with the NEW scores into the
    hitlist; the hash entry is replaced by the fresh hit.  P-values and
    composite E-values are then recomputed for the whole list.
    """
    from .query import prepare_template_hmm

    entry_names: List[str] = []
    seen = set()
    for hit in previous_hits.values():
        if hit.irep == 1 and hit.entry not in seen:
            seen.add(hit.entry)
            entry_names.append(str(hit.entry))
    if not entry_names:
        return

    templates = []
    for name in entry_names:
        t, fmt = db.get_template_hmm_search(name, par, mats, q,
                                            use_global_weights=1)
        templates.append((name, t))

    from .engine import get_resident_pack
    # allow_funnel=False: these hits replace PRESERVED alignments'
    # scores (RescoreWithViterbiKeepAlignment, hhblits.cpp:911-968), so
    # every one needs its real backtraced score incl. SS/correlation
    # terms — a funnel light hit here would copy a truncated score onto
    # a displayed hit (advisor finding r2-medium)
    hits_to_add = viterbi_search(
        par, q, templates, ss_matrices=ss, allow_funnel=False,
        resident_pack=get_resident_pack(db, entry_names, par, mats))
    for h in hits_to_add:
        key = f"{h.file}__{h.irep}"
        hit_cur = previous_hits.get(key)
        if hit_cur is None:
            continue
        previous_hits[key] = h
        hit_cur.score = h.score
        hit_cur.score_aass = h.score_aass
        hit_cur.score_ss = h.score_ss
        hit_cur.Pval = h.Pval
        hit_cur.Pvalt = h.Pvalt
        hit_cur.logPval = h.logPval
        hit_cur.logPvalt = h.logPvalt
        hit_cur.Eval = h.Eval
        hit_cur.logEval = h.logEval
        hit_cur.Probab = h.Probab
        hitlist.hits.append(hit_cur)

    hitlist.sort()
    hitlist.calculate_pvalues(q, par.loc, par.ssm, par.ssw)
    if par.prefilter:
        hitlist.calculate_hhblits_evalues(
            q, par.dbsize, par.alphaa, par.alphab, par.alphac,
            par.prefilter_evalue_thresh)


@gc_paused_fn
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

    # previous_hits maps "file__irep" -> the Hit found in an earlier
    # round (the reference's Hash<Hit>* previous_hits, hhblits.cpp:1071)
    previous_hits: Dict[str, Hit] = {}
    premerged_hits: Set[str] = set()
    # -all/-nodiff: unfiltered copy of the growing alignment
    # (hhblits.cpp:860-862, writers :1846-1860)
    qali_allseqs = copy.deepcopy(qali) if par.allseqs else None
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
                par, q_tmp, lib, cs_names, cs_seqs, previous_hits,
                cache_key=getattr(db, "base", None))
            entry_names = [name for (_l, name) in new_pairs]
            old_entry_names = [name for (_l, name) in old_pairs]
        else:
            entry_names = [e.name for e in db.cs219.entries]
            old_entry_names = []

        search_counter.update(entry_names)
        hitlist.N_searched = len(search_counter)
        if not entry_names:
            break

        templates = []
        for name in entry_names:
            t, fmt = db.get_template_hmm_search(name, par, mats, q,
                                                use_global_weights=1)
            templates.append((name, t))

        from .engine import get_resident_pack
        rpack = get_resident_pack(db, entry_names, par, mats)
        hits = viterbi_search(par, q, templates, ss_matrices=ss,
                              resident_pack=rpack)
        hitlist.extend(hits)
        hitlist.sort()
        hitlist.calculate_pvalues(q, par.loc, par.ssm, par.ssw)
        if par.prefilter:
            hitlist.calculate_hhblits_evalues(
                q, par.dbsize, par.alphaa, par.alphab, par.alphac,
                par.prefilter_evalue_thresh)
        if promote_light_hits(par, q, hitlist, templates, ss):
            hitlist.sort()
            hitlist.calculate_pvalues(q, par.loc, par.ssm, par.ssw)
            if par.prefilter:
                hitlist.calculate_hhblits_evalues(
                    q, par.dbsize, par.alphaa, par.alphab, par.alphac,
                    par.prefilter_evalue_thresh)

        new_hits = sum(1 for h in hitlist if h.Eval <= par.e)

        # old-hit handling on the final round (hhblits.cpp:1236-1263):
        # either fully re-search the previously found templates that
        # re-passed the prefilter (-realign_old_hits), or rescore all
        # previous hits keeping their alignments
        if new_hits == 0 or round_no == par.num_rounds:
            if old_entry_names and par.realign_old_hits:
                hhlog.info("Rescoring previously found HMMs with "
                           "Viterbi algorithm")
                old_templates = []
                for name in old_entry_names:
                    t, fmt = db.get_template_hmm_search(
                        name, par, mats, q, use_global_weights=1)
                    old_templates.append((name, t))
                from .engine import get_resident_pack
                # allow_funnel=False: realign_old_hits hits go straight
                # into display/merge range and must carry full paths
                # (advisor finding r2-medium)
                hitlist.extend(viterbi_search(
                    par, q, old_templates, ss_matrices=ss,
                    allow_funnel=False,
                    resident_pack=get_resident_pack(
                        db, old_entry_names, par, mats)))
                hitlist.sort()
                hitlist.calculate_pvalues(q, par.loc, par.ssm, par.ssw)
                if par.prefilter:
                    hitlist.calculate_hhblits_evalues(
                        q, par.dbsize, par.alphaa, par.alphab,
                        par.alphac, par.prefilter_evalue_thresh)
            elif not par.realign_old_hits and previous_hits:
                hhlog.info("Rescoring previously found HMMs with "
                           "Viterbi algorithm")
                rescore_previous_hits(par, q, db, mats, ss,
                                      previous_hits, hitlist)

        q_re = copy.deepcopy(q)

        def get_template(entry):
            t, fmt = db.get_template_hmm_prepared(str(entry), par, mats,
                                                  use_global_weights=par.wg)
            finish_template_hmm(par, q_re, t, mats)
            return t, fmt

        # premerge runs even with -norealign (hhblits.cpp:1262-1264)
        if par.premerge and db.a3m is not None:
            from .engine import premerge_hits

            premerge_hits(par, q_re, qali, hitlist, get_template, db,
                          mats, ss, previous_hits, premerged_hits,
                          MINCOLS_REALIGN, qali_allseqs=qali_allseqs)
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
                                    mats, MINCOLS_REALIGN, premerged_hits,
                                    qali_allseqs=qali_allseqs)
            qnew = HMM()
            frequencies_and_transitions(qali, qnew, par.wg, par.mark,
                                        par.cons, par.showcons, mats.pb,
                                        mats.Sim)
            if par.notags:
                neutralize_tags(qnew, mats.pb)
            if par.alisbasename:
                alis[round_no] = copy.deepcopy(
                    qali_allseqs if par.allseqs else qali)
        else:
            qnew = q

        last_round = (new_hits == 0 or round_no == par.num_rounds
                      or qnew.Neff_HMM > par.neffmax
                      or qali.N_in >= par.maxseq)
        if last_round:
            break
        q = qnew

        # record good hits as seen (hhblits.cpp:1375-1390): store the
        # whole Hit so the final round can rescore it keeping alignments
        for h in hitlist:
            key = f"{h.file}__{h.irep}"
            if par.already_seen_filter and h.Eval <= par.e \
                    and key not in previous_hits:
                previous_hits[key] = h
        hitlist = HitList()

    q.alis = alis
    # -all: the a3m/psi writers see the unfiltered alignment
    # (hhblits.cpp:1846-1874)
    return q, hitlist, (qali_allseqs if par.allseqs else qali)
