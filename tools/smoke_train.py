"""End-to-end TPU smoke: train PEAGCN on a synthetic HIN for a few epochs.

Evidence of a working slice: train loss drops and HR@10 clearly beats the
0.10 random baseline of the 1-pos + 99-neg protocol.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from graph_recsys_benchmark_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from graph_recsys_benchmark_tpu.data import build_mlsmall_hin, synthetic_mlsmall_raw
from graph_recsys_benchmark_tpu.models.pea import PEAConfig
from graph_recsys_benchmark_tpu.train import PEATrainer, TrainConfig


def main():
    print("backend:", jax.default_backend())
    movies, ratings, tagging = synthetic_mlsmall_raw(seed=0)
    hin = build_mlsmall_hin(movies, ratings, tagging, num_core=3, num_feat_core=2)
    print(
        f"HIN: {hin.num_nodes} nodes, {hin.train_pos.shape[0]} train interactions, "
        f"{hin.num_users} users, {hin.num_items} items"
    )
    cfg = PEAConfig(
        conv="gcn", num_nodes=hin.num_nodes, meta_path_steps=(2,) * 9,
        emb_dim=64, hidden_size=64, repr_dim=16, entity_aware=True,
    )
    tcfg = TrainConfig(batch_size=512, sampling_strategy="unseen")
    trainer = PEATrainer(hin, cfg, tcfg)

    params, opt_state = trainer.init(seed=2020)
    key = jax.random.PRNGKey(0)
    m0 = trainer.evaluate(params, key)
    print(f"epoch 0 (untrained): HR@10={float(m0['HR'][5]):.4f} AUC={float(m0['AUC']):.4f}")

    t0 = time.time()
    for epoch in range(1, 9):
        key, k = jax.random.split(key)
        t = time.time()
        params, opt_state, loss = trainer.run_epoch(params, opt_state, k)
        loss = float(loss)
        m = trainer.evaluate(params, jax.random.PRNGKey(100 + epoch))
        print(
            f"epoch {epoch}: loss={loss:.2f} HR@10={float(m['HR'][5]):.4f} "
            f"NDCG@10={float(m['NDCG'][5]):.4f} AUC={float(m['AUC']):.4f} "
            f"({time.time()-t:.2f}s)"
        )
    print(f"total {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
