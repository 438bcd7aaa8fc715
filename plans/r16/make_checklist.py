"""Emit the r16 per-query checklist table (baseline vs end-of-round
quiet sidecar) for OPTIMIZATION_r16.md.  Run AFTER `bench.py --sidecar`.

Verdict legend:
  OPT     — changed this round (see the matching md entry)
  DESIGN  — cost is the documented by-design kernel/lifecycle wall
  SHAPE   — audited (before-plan + operator read), no structural slack
  AMBIENT — flagged by a loaded run, adjudicated ambient via quiet probe
"""
import json
import pathlib
import sys

# paths resolve relative to the repo root (r16 ADVICE: the hardcoded
# /root/repo paths made this scratch script checkout-specific), with
# optional CLI overrides: make_checklist.py [baseline.json] [sidecar.json]
REPO = pathlib.Path(__file__).resolve().parents[2]
base_path = sys.argv[1] if len(sys.argv) > 1 else REPO / "bench_r16_baseline.json"
cur_path = sys.argv[2] if len(sys.argv) > 2 else REPO / "bench_full.json"
base = json.load(open(base_path))
cur = json.load(open(cur_path))

b = dict(base["mins"]); b.update(base.get("slow_mins", {}))
c = dict(cur["mins"]); c.update(cur.get("slow_mins", {}))

OPT = {
    "plan_pathway_expand", "plan_mass_annotation", "plan_data_pipeline",
    "a6_argmin_dedup", "pipeline_curate", "dedup_incremental_indexed",
    "sim_index_topk", "sim_index_recall", "dedup_keep_best",
    "doc_split_leakage_safe", "dedup_components", "j12_event_join",
    "source_overlap", "dedup_minhash_accuracy", "plan_enzyme_annotation",
}
DESIGN = {
    "k1_graph_rewrite", "k3_substructure", "methylmix_em", "k10_pca_batch",
    "doc_forget", "doc_snapshot_evolve", "doc_upsert", "dedup_incremental",
    "dedup_index_probe", "sim_index_probe", "k4_rule_bfs",
    "text_heavy_hitters", "events_hot_users", "events_hot_users_bytes",
    "doc_profile", "doc_pruned_scan", "events_profile_numeric",
    "doc_dataset_card", "events_salted_join", "p6_mad_filter",
}
AMBIENT = {"j4_band_join", "text_length_quantiles"}

rows = []
for name in sorted(set(b) | set(c)):
    if name in OPT:
        v = "OPT"
    elif name in DESIGN:
        v = "DESIGN"
    elif name in AMBIENT:
        v = "AMBIENT"
    else:
        v = "SHAPE"
    bb = f"{b[name]:.2f}" if name in b else "—"
    cc = f"{c[name]:.2f}" if name in c else "—"
    rows.append(f"| {name} | {bb} | {cc} | {v} |")

print("| query | r16 baseline min (s) | r16 end quiet min (s) | verdict |")
print("|---|---|---|---|")
print("\n".join(rows))
