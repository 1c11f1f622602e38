"""Head-to-head quality parity: reference PyTorch vs genrec-tpu, same H5s.

The BASELINE.md quality gate is "Hit@k/Recall@k/NDCG@k parity with the
reference within run-to-run variance". The reference's committed numbers
were produced on MOOCCube data that is not shipped, so absolute values
can't be compared. What CAN be compared — and what this harness does — is
running the *actual reference code* (`/root/reference/SASRec/main.py:43-49`,
`/root/reference/RQVAE-T5/main.py:37-41`, torch CPU) and the genrec-tpu
pipelines on the SAME synthetic H5 contract files
(`SASRec/data_vision.py:40-46`, `RQVAE-T5/data_vision.py:8-11` read the
same schemas `genrec_tpu.data.contracts` writes), with the same
hyperparameters, over multiple corpus seeds.

The reference is EXECUTED from its read-only checkout (sys.path import;
all output paths injected via its params dict) — no reference code is
copied. Each reference pipeline runs in a subprocess because its module
names (model/train/evaluate/utils/data_vision) collide across pipelines.

Usage:
    python scripts/parity_headtohead.py [--users 8000] [--items 240]
        [--seeds 0 1] [--sasrec-epochs 60] [--tiger-epochs 30]
        [--out artifacts/parity_headtohead.json]

Writes the JSON artifact plus PARITY.md at the repo root.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import subprocess
import sys
import textwrap
import time

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

REF = "/root/reference"
TOPK = [2, 5, 10, 20]


# ---------------------------------------------------------------------------
# shared corpus
# ---------------------------------------------------------------------------

def make_corpus(outdir: str, users: int, items: int, seed: int) -> None:
    from genrec_tpu.data import contracts, synthetic, tiger_tokens
    os.makedirs(outdir, exist_ok=True)
    data = synthetic.make_interactions(users, items, min_len=3, max_len=40,
                                       num_topics=24, topic_stickiness=0.9,
                                       seed=seed)
    contracts.write_interactions(
        os.path.join(outdir, "user_item_interact.h5"), data)
    codes = synthetic.make_codes(items, seed=seed)
    contracts.write_codes(
        os.path.join(outdir, "course_rqvae_codes.npy"), codes)
    train, test = tiger_tokens.build_tiger_splits(
        data.item_id_lists, data.user_ids, codes)
    contracts.write_tiger_split(os.path.join(outdir, "train_dataset.h5"), train)
    contracts.write_tiger_split(os.path.join(outdir, "test_dataset.h5"), test)
    # RQ-VAE input: clustered 768-dim item embeddings (row 0 = padding)
    contracts.write_item_embs(
        os.path.join(outdir, "course_item_embs.h5"),
        synthetic.make_item_embs(items, num_topics=24, seed=seed + 100))
    # TIGER-prefix side inputs: prof_lvl{1,2,3}.h5
    for lvl in (1, 2, 3):
        uids, embs = synthetic.make_prof_embs(users, seed=seed + 200 + lvl)
        contracts.write_prof_lvl(
            os.path.join(outdir, f"prof_lvl{lvl}.h5"), uids, embs)
    # dense-T5 side inputs: course_info / id map / user profile embeddings
    item_ids = [f"C_{i}" for i in range(1, items + 1)]
    contracts.write_course_info(
        os.path.join(outdir, "course_info.h5"), item_ids,
        [f"course {i}" for i in range(1, items + 1)],
        [f"about course {i}" for i in range(1, items + 1)])
    contracts.write_id_map(os.path.join(outdir, "course_id_map.h5"),
                           item_ids, list(range(1, items + 1)))
    contracts.write_user_embs(
        os.path.join(outdir, "user_profile_embs.h5"),
        synthetic.make_user_embs(users, seed=seed + 300))


# ---------------------------------------------------------------------------
# reference side (torch CPU, subprocess per pipeline)
# ---------------------------------------------------------------------------

def _run_ref(code: str, cwd: str, timeout_s: int) -> dict:
    env = dict(os.environ,
               MPLBACKEND="Agg", CUDA_VISIBLE_DEVICES="",
               HF_HUB_OFFLINE="1", TOKENIZERS_PARALLELISM="false",
               # 2-core host: parallel ref queues set PARITY_REF_OMP=1 so two
               # niced torch runs share the machine without oversubscription
               OMP_NUM_THREADS=os.environ.get("PARITY_REF_OMP", "2"),
               JAX_PLATFORMS="cpu")
    t0 = time.time()
    proc = subprocess.run([sys.executable, "-c", code], cwd=cwd, env=env,
                          capture_output=True, text=True, timeout=timeout_s)
    if proc.returncode != 0:
        raise RuntimeError(
            f"reference run failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-4000:]}")
    for line in proc.stdout.splitlines():
        if line.startswith("PARITY_JSON:"):
            out = json.loads(line[len("PARITY_JSON:"):])
            out["wall_seconds"] = time.time() - t0
            return out
    raise RuntimeError(f"no PARITY_JSON in reference output:\n"
                       f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")


def run_ref_sasrec(datadir: str, workdir: str, epochs: int,
                   model_seed: int) -> dict:
    os.makedirs(workdir, exist_ok=True)
    params = {
        "task_id": "parity", "device": "cpu",
        "data_path": os.path.join(datadir, "user_item_interact.h5"),
        "ckpt": os.path.join(workdir, "sasrec.pt"),
        "max_len": 20, "d": 16, "num_blocks": 2, "num_heads": 1,
        "dropout": 0.2, "lr": 1e-3, "batch_size": 128,
        "eval_batch_size": 128, "epochs": epochs, "mlp_layer": 64,
        "layernorm_eps": 1e-8, "num_neg_samples": 10, "num_workers": 0,
        "adam_betas": (0.9, 0.98), "loss_eps": 1e-24,
        "topk_list": TOPK, "min_seq_len": 3,
        "log_path": os.path.join(workdir, "sasrec.log"),
        "loss_plot_path": os.path.join(workdir, "loss.png"),
        "params_path": os.path.join(workdir, "results.csv"),
        "early_stop": 10, "seed": model_seed,
    }
    code = textwrap.dedent(f"""
        import json, sys, torch, numpy, random
        sys.path.insert(0, {REF + "/SASRec"!r})
        params = json.loads({json.dumps(params)!r})
        params["adam_betas"] = tuple(params["adam_betas"])
        torch.manual_seed(params["seed"]); numpy.random.seed(params["seed"])
        random.seed(params["seed"])
        from train import train
        from evaluate import evaluate
        train(params)
        out = {{}}
        for k in params["topk_list"]:
            params["top_k"] = k
            out.update({{m: float(v) for m, v in evaluate(params).items()}})
        print("PARITY_JSON:" + json.dumps(out))
    """)
    return _run_ref(code, workdir, timeout_s=3600)


def run_ref_rqvae(datadir: str, workdir: str, epochs: int,
                  model_seed: int) -> dict:
    """Reference RQ-VAE (`RQ-VAE/main.py:6-36` params): train → dual-best →
    infer with collision repair + 4th-digit dedup. Metrics: best val loss,
    best collision rate, and post-repair code-table stats."""
    os.makedirs(workdir, exist_ok=True)
    params = {
        "data_path": os.path.join(datadir, "course_item_embs.h5"),
        "ckpt_dir": os.path.join(workdir, "ckpt"),
        "semantic_id_file": os.path.join(workdir, "codes.npy"),
        "in_dim": 768, "num_emb_list": [8, 8, 8], "e_dim": 32,
        "layers": [256, 128], "dropout": 0.1, "batch_normalize": False,
        "loss_type": "mse", "quant_loss_weight": 0.1, "beta": 0.25,
        "kmeans_init": True, "kmeans_iters": 50, "lr": 1e-3,
        "epochs": epochs, "warmup_epochs": 5, "batch_size": 64,
        "num_workers": 0, "eval_step": 5,
        "sk_epsilons": [0.01, 0.01, 0.01], "sk_iters": 50,
        "learner": "Adamw", "lr_scheduler_type": "linear",
        "weight_decay": 1e-4, "save_limit": 5, "device": "cpu",
        "seed": model_seed,
    }
    code = textwrap.dedent(f"""
        import json, sys, numpy as np
        sys.path.insert(0, {REF + "/RQ-VAE"!r})
        params = json.loads({json.dumps(params)!r})
        import random, numpy, torch
        import train as T
        from vision_data import EmbDataset
        from models.rqvae import RQVAE
        from torch.utils.data import DataLoader
        # T.train() returns None (prints only) and hard-codes seed 2024
        # (RQ-VAE/train.py:254) — replicate its body to capture the fit
        # result; model_seed therefore has no effect on this side either.
        seed = 2024
        random.seed(seed); numpy.random.seed(seed); torch.manual_seed(seed)
        data = EmbDataset(params["data_path"])
        model = RQVAE(in_dim=data.dim, num_emb_list=params["num_emb_list"],
                      e_dim=params["e_dim"], layers=params["layers"],
                      dropout_prob=params["dropout"],
                      bn=params["batch_normalize"],
                      loss_type=params["loss_type"],
                      quant_loss_weight=params["quant_loss_weight"],
                      beta=params["beta"], kmeans_init=params["kmeans_init"],
                      kmeans_iters=params["kmeans_iters"],
                      sk_epsilons=params["sk_epsilons"],
                      sk_iters=params["sk_iters"])
        loader = DataLoader(data, num_workers=0,
                            batch_size=params["batch_size"], shuffle=True,
                            pin_memory=False)
        best_loss, best_collision = T.Trainer(params, model,
                                              len(loader)).fit(loader)
        from infer import infer
        infer(params)
        codes = np.load(params["semantic_id_file"])
        uniq = len(np.unique(codes, axis=0))
        out = {{"best_val_loss": float(best_loss),
                "best_collision@rate": float(best_collision),
                "post_unique@frac": uniq / len(codes),
                "prefix3@distinct": int(len(np.unique(codes[:, :3], axis=0)))}}
        print("PARITY_JSON:" + json.dumps(out))
    """)
    return _run_ref(code, workdir, timeout_s=3600)


def run_ref_tiger_prefix(datadir: str, workdir: str, epochs: int,
                         model_seed: int) -> dict:
    """Reference prefix-conditioned TIGER (`RQVAE-T5-prefix/main.py:4-43`
    params, CPU) on the shared corpus + synthetic prof_lvl h5s."""
    os.makedirs(workdir, exist_ok=True)
    params = {
        "task_id": "parity",
        "code_path": os.path.join(datadir, "course_rqvae_codes.npy"),
        "train_dataset_path": os.path.join(datadir, "train_dataset.h5"),
        "test_dataset_path": os.path.join(datadir, "test_dataset.h5"),
        "batch_size": 256, "infer_size": 256, "num_epochs": epochs,
        "lr": 1e-3, "device": "cpu", "num_layers": 2,
        "num_decoder_layers": 4, "d_model": 128, "d_ff": 512,
        "num_heads": 8, "d_kv": 16, "dropout_rate": 0.1, "vocab_size": 64,
        "codebook_size": 8, "pad_token_id": 0, "eos_token_id": 31,
        "feed_forward_proj": "relu", "max_len": 20,
        "log_path": os.path.join(workdir, "tiger.log"),
        "seed": model_seed,
        "save_path": os.path.join(workdir, "tiger.pth"),
        "params_path": os.path.join(workdir, "results.csv"),
        "early_stop": 10, "topk_list": TOPK,
        "loss_plot_path": os.path.join(workdir, "loss.png"),
        "beam_size": 20, "bert_dim": 768,
        "prof_h5_paths": {
            f"prof_lvl{i}": os.path.join(datadir, f"prof_lvl{i}.h5")
            for i in (1, 2, 3)},
    }
    code = textwrap.dedent(f"""
        import json, sys, time
        sys.path.insert(0, {REF + "/RQVAE-T5-prefix"!r})
        params = json.loads({json.dumps(params)!r})
        # version-compat shim: this image's transformers sizes the decoder
        # KV cache from config.num_layers, which breaks the reference's
        # asymmetric 2-enc/4-dec config during generate (IndexError in
        # cache_utils). Bumping num_layers post-construction only affects
        # cache sizing — the modules are already built.
        import model as M
        _orig_init = M.TIGER.__init__
        def _patched(self, *a, **k):
            _orig_init(self, *a, **k)
            c = self.model.config
            c.num_layers = max(c.num_layers, c.num_decoder_layers)
        M.TIGER.__init__ = _patched
        from train import train
        from evaluate import infer
        train(params)
        t0 = time.time()
        recalls, ndcgs = infer(params)
        out = {{m: float(v) for m, v in {{**recalls, **ndcgs}}.items()}}
        out["eval_seconds"] = time.time() - t0
        print("PARITY_JSON:" + json.dumps(out))
    """)
    return _run_ref(code, workdir, timeout_s=21600)


def run_ref_dense_t5(datadir: str, workdir: str, epochs: int,
                     model_seed: int) -> dict:
    """Reference dense-retrieval T5 (`T5/main.py:5-38` params, CPU). Its
    `infer()` crashes on a 4-from-3 unpack (`T5/evaluate.py:32`); the
    faithful protocol is train → load best ckpt → the in-file
    `evaluate()` (`T5/train.py:69-97`), replicated here."""
    os.makedirs(workdir, exist_ok=True)
    params = {
        "task_id": "parity",
        "rec_path": os.path.join(datadir, "user_item_interact.h5"),
        "course_path": os.path.join(datadir, "course_info.h5"),
        "course_id_map_path": os.path.join(datadir, "course_id_map.h5"),
        "item_emb_h5_path": os.path.join(datadir, "course_item_embs.h5"),
        "user_emb_h5_path": os.path.join(datadir, "user_profile_embs.h5"),
        "batch_size": 256, "infer_size": 256, "num_epochs": epochs,
        "lr": 1e-3, "device": "cpu", "num_layers": 2, "d_model": 512,
        "d_ff": 256, "num_heads": 4, "d_kv": 16, "dropout_rate": 0.3,
        "feed_forward_proj": "relu", "input_emb_dim": 768,
        "target_emb_dim": 768, "temperature": 0.07,
        "log_path": os.path.join(workdir, "tiger.log"),
        "seed": model_seed,
        "save_path": os.path.join(workdir, "t5.pth"),
        "params_path": os.path.join(workdir, "results.csv"),
        "early_stop": 10, "topk_list": TOPK,
        "loss_plot_path": os.path.join(workdir, "loss.png"),
    }
    code = textwrap.dedent(f"""
        import json, sys, time
        import numpy as np, torch
        sys.path.insert(0, {REF + "/T5"!r})
        params = json.loads({json.dumps(params)!r})
        from train import train, build_splits_and_loaders, evaluate
        from model import TIGER
        train(params)
        train_ds, _, test_loader = build_splits_and_loaders(params)
        model = TIGER(params)
        model.load_state_dict(torch.load(params["save_path"],
                                         map_location="cpu"))
        model.to("cpu"); model.eval()
        t0 = time.time()
        recalls, ndcgs = evaluate(model, test_loader,
                                  np.asarray(train_ds.item_embs), params,
                                  torch.device("cpu"))
        out = {{m: float(v) for m, v in {{**recalls, **ndcgs}}.items()}}
        out["eval_seconds"] = time.time() - t0
        print("PARITY_JSON:" + json.dumps(out))
    """)
    return _run_ref(code, workdir, timeout_s=21600)


def run_ref_tiger(datadir: str, workdir: str, epochs: int,
                  model_seed: int) -> dict:
    os.makedirs(workdir, exist_ok=True)
    params = {
        "task_id": "parity",
        "code_path": os.path.join(datadir, "course_rqvae_codes.npy"),
        "train_dataset_path": os.path.join(datadir, "train_dataset.h5"),
        "test_dataset_path": os.path.join(datadir, "test_dataset.h5"),
        "batch_size": 256, "infer_size": 256, "num_epochs": epochs,
        "lr": 1e-3, "device": "cpu", "num_layers": 2,
        "num_decoder_layers": 2, "d_model": 64, "d_ff": 256,
        "num_heads": 4, "d_kv": 16, "dropout_rate": 0.1, "vocab_size": 64,
        "codebook_size": 8, "pad_token_id": 0, "eos_token_id": 31,
        "feed_forward_proj": "relu", "max_len": 20,
        "log_path": os.path.join(workdir, "tiger.log"),
        "seed": model_seed,
        "save_path": os.path.join(workdir, "tiger.pth"),
        "params_path": os.path.join(workdir, "results.csv"),
        "early_stop": 10, "topk_list": TOPK,
        "loss_plot_path": os.path.join(workdir, "loss.png"),
        "beam_size": 20,
    }
    code = textwrap.dedent(f"""
        import json, sys, time
        sys.path.insert(0, {REF + "/RQVAE-T5"!r})
        params = json.loads({json.dumps(params)!r})
        from train import train
        from evaluate import infer
        train(params)
        t0 = time.time()
        recalls, ndcgs = infer(params)
        out = {{m: float(v) for m, v in {{**recalls, **ndcgs}}.items()}}
        out["eval_seconds"] = time.time() - t0
        print("PARITY_JSON:" + json.dumps(out))
    """)
    return _run_ref(code, workdir, timeout_s=21600)


# ---------------------------------------------------------------------------
# genrec-tpu side (in-process; default backend = the real chip)
# ---------------------------------------------------------------------------

def run_tpu_sasrec(datadir: str, workdir: str, epochs: int,
                   model_seed: int) -> dict:
    from genrec_tpu import configs
    from genrec_tpu.pipelines import sasrec_pipeline
    cfg = configs.SASRecConfig(
        data_path=os.path.join(datadir, "user_item_interact.h5"),
        # torch nn.Embedding init (N(0,1)): at d=16 the init scale decides
        # where the val-BCE curve bottoms and therefore which epoch the
        # reference's early-stop protocol selects — parity must follow the
        # reference's trajectory, so match its init here.
        emb_init_stddev=1.0,
        trainer=dataclasses.replace(
            configs.SASRecConfig().trainer, epochs=epochs, seed=model_seed,
            early_stop_patience=10, ckpt_dir=os.path.join(workdir, "ckpt"),
            log_path=os.path.join(workdir, "sasrec.log")))
    t0 = time.time()
    art = sasrec_pipeline.train(cfg)
    out = {k: float(v) for k, v in
           sasrec_pipeline.evaluate(cfg, art).items()}
    out["wall_seconds"] = time.time() - t0
    out["train_examples_per_sec"] = art.result.examples_per_sec
    out["steady_examples_per_sec"] = art.result.steady_examples_per_sec
    return out


def run_tpu_rqvae(datadir: str, workdir: str, epochs: int,
                  model_seed: int) -> dict:
    import numpy as np

    from genrec_tpu import configs
    from genrec_tpu.pipelines import rqvae_pipeline
    cfg = configs.RQVAEConfig(
        data_path=os.path.join(datadir, "course_item_embs.h5"),
        ckpt_dir=os.path.join(workdir, "ckpt"),
        semantic_id_file=os.path.join(workdir, "codes.npy"),
        trainer=dataclasses.replace(
            configs.RQVAEConfig().trainer, epochs=epochs, seed=model_seed,
            ckpt_dir=os.path.join(workdir, "ckpt"),
            log_path=os.path.join(workdir, "rqvae.log")))
    t0 = time.time()
    art = rqvae_pipeline.train(cfg)
    codes = rqvae_pipeline.infer(cfg, art)
    uniq = len(np.unique(codes, axis=0))
    return {"best_val_loss": float(art.result.best_val_loss),
            "best_collision@rate": float(art.final_collision_rate),
            "post_unique@frac": uniq / len(codes),
            "prefix3@distinct": int(len(np.unique(codes[:, :3], axis=0))),
            "wall_seconds": time.time() - t0}


def run_tpu_tiger_prefix(datadir: str, workdir: str, epochs: int,
                         model_seed: int) -> dict:
    from genrec_tpu import configs
    from genrec_tpu.data import datasets
    from genrec_tpu.data.contracts import read_tiger_split
    from genrec_tpu.pipelines import tiger_prefix_pipeline
    prof_paths = tuple(os.path.join(datadir, f"prof_lvl{i}.h5")
                       for i in (1, 2, 3))
    cfg = configs.TIGERPrefixConfig(
        code_path=os.path.join(datadir, "course_rqvae_codes.npy"),
        train_dataset_path=os.path.join(datadir, "train_dataset.h5"),
        test_dataset_path=os.path.join(datadir, "test_dataset.h5"),
        prof_lvl_paths=prof_paths,
        arch=dataclasses.replace(configs.TIGERPrefixConfig().arch, d_ff=512),
        constrained_decoding="none",  # parity: reference decodes unconstrained
        beam_size=20,
        trainer=dataclasses.replace(
            configs.TIGERPrefixConfig().trainer, epochs=epochs,
            seed=model_seed, early_stop_patience=10,
            ckpt_dir=os.path.join(workdir, "ckpt"),
            log_path=os.path.join(workdir, "tiger.log")))
    t0 = time.time()
    art = tiger_prefix_pipeline.train(cfg)
    t1 = time.time()
    out = {k: float(v) for k, v in
           tiger_prefix_pipeline.evaluate(cfg, art).items()}
    out["eval_seconds"] = time.time() - t1
    out["wall_seconds"] = time.time() - t0
    out["train_examples_per_sec"] = art.result.examples_per_sec
    return out


def run_tpu_dense_t5(datadir: str, workdir: str, epochs: int,
                     model_seed: int) -> dict:
    from genrec_tpu import configs
    from genrec_tpu.pipelines import dense_t5_pipeline
    cfg = configs.DenseT5Config(
        rec_path=os.path.join(datadir, "user_item_interact.h5"),
        item_emb_h5_path=os.path.join(datadir, "course_item_embs.h5"),
        user_emb_h5_path=os.path.join(datadir, "user_profile_embs.h5"),
        trainer=dataclasses.replace(
            configs.DenseT5Config().trainer, epochs=epochs, seed=model_seed,
            early_stop_patience=10, ckpt_dir=os.path.join(workdir, "ckpt"),
            log_path=os.path.join(workdir, "t5.log")))
    t0 = time.time()
    art = dense_t5_pipeline.train(cfg)
    t1 = time.time()
    out = {k: float(v) for k, v in
           dense_t5_pipeline.evaluate(cfg, art).items()}
    out["eval_seconds"] = time.time() - t1
    out["wall_seconds"] = time.time() - t0
    out["train_examples_per_sec"] = art.result.examples_per_sec
    # budget evidence: per-epoch val curve + which epoch best-val selected,
    # comparable against the reference log's per-epoch lines
    out["val_losses"] = [float(v) for v in art.result.val_losses]
    out["best_val_epoch"] = 1 + int(np.argmin(art.result.val_losses))
    out["num_layers"] = cfg.arch.num_layers
    return out


def run_tpu_tiger(datadir: str, workdir: str, epochs: int,
                  model_seed: int) -> dict:
    from genrec_tpu import configs
    from genrec_tpu.pipelines import tiger_pipeline
    cfg = configs.TIGERConfig(
        code_path=os.path.join(datadir, "course_rqvae_codes.npy"),
        train_dataset_path=os.path.join(datadir, "train_dataset.h5"),
        test_dataset_path=os.path.join(datadir, "test_dataset.h5"),
        constrained_decoding="none",  # parity: reference decodes unconstrained
        beam_size=20,
        trainer=dataclasses.replace(
            configs.TIGERConfig().trainer, epochs=epochs, seed=model_seed,
            early_stop_patience=10, ckpt_dir=os.path.join(workdir, "ckpt"),
            log_path=os.path.join(workdir, "tiger.log")))
    t0 = time.time()
    art = tiger_pipeline.train(cfg)
    t1 = time.time()
    out = {k: float(v) for k, v in tiger_pipeline.evaluate(cfg, art).items()}
    out["eval_seconds"] = time.time() - t1
    out["wall_seconds"] = time.time() - t0
    out["train_examples_per_sec"] = art.result.examples_per_sec
    out["steady_examples_per_sec"] = art.result.steady_examples_per_sec
    return out


# ---------------------------------------------------------------------------
# report
# ---------------------------------------------------------------------------

def _fmt_table(title: str, metric_names, ref_runs, tpu_runs) -> str:
    """Pooled mean [min–max] over all (corpus seed × model seed) runs per
    side — the early-stop protocol's run-to-run variance dominates single
    draws, so single-seed columns would overstate precision."""
    lines = [f"### {title}", ""]
    lines.append(f"| metric | ref mean [min–max] (n={len(ref_runs)}) "
                 f"| genrec-tpu mean [min–max] (n={len(tpu_runs)}) | rel Δ of means |")
    lines.append("|---|---|---|---|")
    for m in metric_names:
        ref_vals = [r[m] for r in ref_runs]
        tpu_vals = [r[m] for r in tpu_runs]
        rm, tm = float(np.mean(ref_vals)), float(np.mean(tpu_vals))
        rel = (tm - rm) / rm if rm else float("nan")
        lines.append(
            f"| {m} | {rm:.4f} [{min(ref_vals):.4f}–{max(ref_vals):.4f}] "
            f"| {tm:.4f} [{min(tpu_vals):.4f}–{max(tpu_vals):.4f}] "
            f"| {rel:+.1%} |")
    return "\n".join(lines) + "\n"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=8000)
    ap.add_argument("--items", type=int, default=240)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1])
    ap.add_argument("--sasrec-epochs", type=int, default=60)
    ap.add_argument("--tiger-epochs", type=int, default=30)
    ap.add_argument("--workdir", default="/tmp/parity_h2h")
    ap.add_argument("--out", default=os.path.join(REPO, "artifacts",
                                                  "parity_headtohead.json"))
    ap.add_argument("--skip", nargs="*", default=[],
                    choices=["ref-sasrec", "ref-tiger", "tpu-sasrec",
                             "tpu-tiger", "ref-rqvae", "tpu-rqvae",
                             "ref-tiger-prefix", "tpu-tiger-prefix",
                             "ref-dense-t5", "tpu-dense-t5"])
    ap.add_argument("--rqvae-epochs", type=int, default=100)
    ap.add_argument("--prefix-epochs", type=int, default=25)
    ap.add_argument("--dense-t5-epochs", type=int, default=30)
    ap.add_argument("--model-seeds", type=int, nargs="+", default=[42],
                    help="model/init seeds per corpus; >1 quantifies the "
                    "early-stop protocol's run-to-run variance")
    ap.add_argument("--no-md", action="store_true",
                    help="write the JSON artifact only; PARITY.md is owned "
                    "by scripts/parity_merge.py when runs span invocations")
    args = ap.parse_args()

    results = {"config": vars(args)}
    runs: dict = {k: [] for k in
                  ("ref_sasrec", "tpu_sasrec", "ref_tiger", "tpu_tiger",
                   "ref_rqvae", "tpu_rqvae",
                   "ref_tiger_prefix", "tpu_tiger_prefix",
                   "ref_dense_t5", "tpu_dense_t5")}

    for seed in args.seeds:
        ddir = os.path.join(args.workdir, f"data_s{seed}")
        make_corpus(ddir, args.users, args.items, seed)
        print(f"[seed {seed}] corpus written to {ddir}", flush=True)

        jobs = [
            ("ref_sasrec", "ref-sasrec", run_ref_sasrec, args.sasrec_epochs),
            ("tpu_sasrec", "tpu-sasrec", run_tpu_sasrec, args.sasrec_epochs),
            ("ref_tiger", "ref-tiger", run_ref_tiger, args.tiger_epochs),
            ("tpu_tiger", "tpu-tiger", run_tpu_tiger, args.tiger_epochs),
            ("ref_rqvae", "ref-rqvae", run_ref_rqvae, args.rqvae_epochs),
            ("tpu_rqvae", "tpu-rqvae", run_tpu_rqvae, args.rqvae_epochs),
            ("ref_tiger_prefix", "ref-tiger-prefix", run_ref_tiger_prefix,
             args.prefix_epochs),
            ("tpu_tiger_prefix", "tpu-tiger-prefix", run_tpu_tiger_prefix,
             args.prefix_epochs),
            ("ref_dense_t5", "ref-dense-t5", run_ref_dense_t5,
             args.dense_t5_epochs),
            ("tpu_dense_t5", "tpu-dense-t5", run_tpu_dense_t5,
             args.dense_t5_epochs),
        ]
        for key, skip_key, fn, epochs in jobs:
            if skip_key in args.skip:
                continue
            for mseed in args.model_seeds:
                tag = f"_m{mseed}" if len(args.model_seeds) > 1 else ""
                wdir = os.path.join(args.workdir, f"{key}_s{seed}{tag}")
                t0 = time.time()
                out = fn(ddir, wdir, epochs, model_seed=mseed)
                out["corpus_seed"], out["model_seed"] = seed, mseed
                print(f"[seed {seed} m{mseed}] {key}: {time.time()-t0:.0f}s "
                      + json.dumps({k: round(v, 4) for k, v in out.items()
                                    if "@" in k}), flush=True)
                runs[key].append(out)
                # incremental write: hours-long reference runs must not be
                # lost if a later run (or the driver) dies mid-invocation
                results["runs"] = runs
                os.makedirs(os.path.dirname(args.out), exist_ok=True)
                with open(args.out, "w") as f:
                    json.dump(results, f, indent=2, default=float)

    results["runs"] = runs
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2, default=float)
    print(f"wrote {args.out}")

    if args.no_md:
        return

    # PARITY.md
    md = [
        "# PARITY — head-to-head vs the PyTorch reference",
        "",
        f"Same synthetic corpora ({args.users} users × {args.items} items, "
        f"corpus seeds {args.seeds}), same H5 contract files, same "
        "hyperparameters (the reference `main.py` param dicts). Reference "
        "runs the actual `/root/reference` code on torch CPU; genrec-tpu "
        "runs its pipelines on the default backend (one TPU chip). TIGER "
        "decodes UNCONSTRAINED on both sides (the trie-constrained mode is "
        "a genrec-tpu improvement, off for parity). Harness: "
        "`scripts/parity_headtohead.py`.",
        "",
    ]
    sas_metrics = [f"Hit@{k}" for k in TOPK] + [f"NDCG@{k}" for k in TOPK]
    tig_metrics = [f"Recall@{k}" for k in TOPK] + [f"NDCG@{k}" for k in TOPK]
    if runs["ref_sasrec"] and runs["tpu_sasrec"]:
        md.append(_fmt_table("SASRec (leave-one-out, strict rank)",
                             sas_metrics, runs["ref_sasrec"],
                             runs["tpu_sasrec"]))
    if runs["ref_tiger"] and runs["tpu_tiger"]:
        md.append(_fmt_table("TIGER (beam 20, exact-sequence match)",
                             tig_metrics, runs["ref_tiger"],
                             runs["tpu_tiger"]))
    md.append("Raw runs (incl. wall-clock and throughput): "
              "`artifacts/parity_headtohead.json`.\n")
    with open(os.path.join(REPO, "PARITY.md"), "w") as f:
        f.write("\n".join(md))
    print("wrote PARITY.md")


if __name__ == "__main__":
    main()
