"""Rotation rule #2 ("any query whose code changed this round must be
in the driver's 50-entry window") as a MECHANICAL check, not prose —
the r12 verdict's ask #2. scripts/check_rotation.py is the tool;
these tests pin its pieces and run the real check against the live
git tree, so a round that edits an operator module without windowing
its queries fails pytest, not just the judge's review."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import check_rotation as cr  # noqa: E402


def test_query_defining_modules_via_closure():
    """The registry introspection resolves each query to the module
    that actually implements it (not the _q wrapper's module)."""
    defining = cr.query_defining_modules()
    assert defining["q_audio_adpcm"] == "operators.audio"
    assert defining["q_pagerank"] == "operators.graph"
    assert defining["q_dedup_minhash"] == "operators.dedup"
    assert defining["q_agg_pricing"] == "operators.relational"
    assert len(defining) == len(set(defining)) and len(defining) >= 118


def test_import_graph_transitivity():
    """A change to a shared helper module flags downstream families:
    the audio decoders call operators/multimodal.py's parse_wav_chunks,
    so multimodal must be in audio's transitive dependency set."""
    graph = cr.package_import_graph()
    assert "operators.audio" in graph
    deps = cr.transitive_deps(graph, "operators.audio")
    assert "operators.multimodal" in deps


def test_affected_queries_fake_change_detects_out_of_window():
    """Synthetic negative case: pretend operators/dedup.py changed.
    Its queries include r14 deferrals (out of window), so the check
    must surface them — this is the failure mode the r12 round hit."""
    import __spark_entry__ as entrymod

    defining = cr.query_defining_modules()
    graph = cr.package_import_graph()
    affected = cr.affected_queries({"operators.dedup"}, defining, graph)
    assert "q_dedup_minhash" in affected and "q_dedup_docs" in affected
    window = set(list(entrymod.queries())[: cr.WINDOW])
    # the witness must be a dedup.py query that is genuinely OUT of
    # the CURRENT window (it changes as the window rotates): the r21
    # window is the 50 r18-green rows, which contain NO dedup.py
    # query, so q_dedup_docs (r19-green, in the tail block) is a
    # stable out-of-window witness. A dedup.py change must surface it.
    assert "q_dedup_docs" in affected - window


def test_file_waivers_round_scoped(tmp_path):
    """ROTATION_WAIVERS lines apply only while the diff base matches
    their recorded commit prefix — a waiver recorded for one round
    expires at the next round marker instead of persisting silently."""
    wf = tmp_path / "ROTATION_WAIVERS"
    wf.write_text(
        "# comment line\n"
        "abc123 operators.dedup q_dedup_clusters checkpoint-knob fix\n"
        "def456 catalog spread gate hardening\n"
    )
    this_round = cr.file_waivers("abc123def0000", path=str(wf))
    assert this_round == {
        "operators.dedup": "q_dedup_clusters checkpoint-knob fix"
    }
    next_round = cr.file_waivers("999999999", path=str(wf))
    assert next_round == {}
    # missing file: no waivers, no crash
    assert cr.file_waivers("abc", path=str(tmp_path / "missing")) == {}


def test_live_tree_rotation_rule_holds():
    """The REAL check, against the actual git diff since the round
    marker: every query affected by this round's engine edits must be
    inside the current window. This is the test that makes rule #2
    self-enforcing — if it fails, rotate the window, don't skip it."""
    proc = subprocess.run(
        [sys.executable, "scripts/check_rotation.py"],
        cwd=REPO, capture_output=True, text=True,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
