"""Batched full-test-set inference (BASELINE.json config 2).

Instead of one forward per complex (`inference_rigid.py:131-196`), all test
complexes are featurized, size-bucketed, and pushed through the model in
padded batches on one chip; predicted (R, t) are then applied per complex to
all ligand atoms and written as PDBs.
"""

from __future__ import annotations

import os
import time

import jax
import numpy as np

from ..config import Config
from ..data.featurize import alpha_carbon_array, build_protein_graph, filter_residues
from ..data.pdb import group_residues, read_pdb, write_pdb
from ..graph import collate
from ..models.iegmn import docking_forward


def run_batched_inference(
    params, cfg: Config,
    input_dir: str, ground_truth_dir: str, output_dir: str,
    method_name: str = "equidock_tpu", batch_size: int = 5,
    log=print,
    bn_state=None,
) -> float:
    """Dock every `*_l_b.pdb` in input_dir in padded batches. Returns total
    model wall-time (seconds) excluding PDB I/O."""
    os.makedirs(output_dir, exist_ok=True)
    stems = sorted(f[: -len("_l_b.pdb")] for f in os.listdir(input_dir)
                   if f.endswith("_l_b.pdb"))

    # host-side featurization
    entries = []
    for stem in stems:
        lig_table = read_pdb(os.path.join(input_dir, f"{stem}_l_b.pdb"))
        rec_path = os.path.join(ground_truth_dir, f"{stem}_r_b_COMPLEX.pdb")
        lig_res = filter_residues(group_residues(lig_table))
        rec_res = filter_residues(group_residues(read_pdb(rec_path)))
        gc = cfg.graph
        entries.append(dict(
            stem=stem, table=lig_table,
            lig=build_protein_graph(lig_res, gc.graph_cutoff, gc.graph_max_neighbor),
            rec=build_protein_graph(rec_res, gc.graph_cutoff, gc.graph_max_neighbor),
            gt_lig=alpha_carbon_array(lig_res)))

    # size-sorted batches cut padding waste
    entries.sort(key=lambda e: max(e["lig"].num_nodes, e["rec"].num_nodes))
    forward = jax.jit(
        lambda p, b: docking_forward(p, cfg.model, b, bn_state=bn_state))

    model_time = 0.0
    for start in range(0, len(entries), batch_size):
        chunk = entries[start:start + batch_size]
        ligs = [e["lig"] for e in chunk]
        recs = [e["rec"] for e in chunk]
        batch = collate(
            ligs, recs, [g.x for g in ligs], [e["gt_lig"] for e in chunk],
            [np.zeros((4, 3), np.float32)] * len(chunk),
            [np.zeros((4, 3), np.float32)] * len(chunk),
            cfg.data.node_buckets, cfg.data.pocket_buckets,
            batch_size=batch_size)
        t0 = time.perf_counter()
        out = forward(params, batch)
        jax.block_until_ready(out["R"])
        model_time += time.perf_counter() - t0
        R = np.asarray(out["R"])
        t = np.asarray(out["t"])
        for i, e in enumerate(chunk):
            moved = (R[i] @ e["table"].coords.T).T + t[i]
            out_path = os.path.join(
                output_dir, f"{e['stem']}_l_b_{method_name.upper()}.pdb")
            write_pdb(out_path, e["table"], moved.astype(np.float32))
    log(f"batched inference: {len(entries)} complexes, "
        f"model time {model_time:.2f}s "
        f"({model_time / max(len(entries), 1) * 1e3:.1f} ms/complex)")
    return model_time
