#!/usr/bin/env python
"""Inverse-action model training CLI — public entry point parity with the
reference (/root/reference/train_inverse_model.py:20-28,179-199: absl-style
flags, Gibson sim trajectory npys, checkpoints under
inverse_model_runs/<logdir>/)."""

import argparse


def main():
    parser = argparse.ArgumentParser(description="train inverse-action model (TPU)")
    parser.add_argument("--train_data", default="data/inverse_model/medium_inverse_train_data.npy")
    parser.add_argument("--backbone-weights", default="",
                        help="torchvision resnet18 state dict for the frozen trunk")
    parser.add_argument("--val_data", default="data/inverse_model/medium_inverse_val_data.npy")
    parser.add_argument("--image_root", default="", help="root for state image folders")
    parser.add_argument("--lr", type=float, default=0.001)
    parser.add_argument("--lr_decay", type=float, default=0.9)
    parser.add_argument("--lr_decay_every", type=float, default=1.0,
                        help="decay interval in epochs")
    parser.add_argument("--weight_decay", type=float, default=0.0)
    parser.add_argument("--batch_size", type=int, default=128)
    parser.add_argument("--num_steps", type=int, default=20000)
    parser.add_argument("--gpu", type=int, default=0, help="ignored (compat)")
    parser.add_argument("--logdir", default="runs_gibson_wd=0")
    parser.add_argument("--out_dir", default="",
                        help="checkpoint/metrics dir (overrides "
                             "inverse_model_runs/<logdir>)")
    parser.add_argument("--image_size", type=int, default=224)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--cache-images", action="store_true",
                        help="keep decoded state images in RAM across epochs")
    args = parser.parse_args()

    import numpy as np

    from video_dqn_tpu.core.metrics import MetricsWriter
    from video_dqn_tpu.data.gibson_pairs import GibsonPairBatcher
    from video_dqn_tpu.train.inverse import make_inverse_eval, run_inverse_train

    pair_kwargs = dict(image_root=args.image_root, image_size=args.image_size,
                       seed=args.seed, cache_images=args.cache_images)
    train_b = GibsonPairBatcher(args.train_data, **pair_kwargs)
    val_b = GibsonPairBatcher(args.val_data, **pair_kwargs)
    steps_per_epoch = max(1, len(train_b) // args.batch_size)
    out_dir = args.out_dir or f"inverse_model_runs/{args.logdir}"
    writer = MetricsWriter(out_dir)
    model, state = run_inverse_train(
        train_b,
        val_b,
        out_dir=out_dir,
        writer=writer,
        batch_size=args.batch_size,
        num_steps=args.num_steps,
        lr=args.lr,
        lr_decay=args.lr_decay,
        decay_every_steps=int(args.lr_decay_every * steps_per_epoch),
        weight_decay=args.weight_decay,
        image_size=args.image_size,
        seed=args.seed,
        backbone_weights=args.backbone_weights,
    )
    # final scoreboard line for drivers (scripts/lifecycle_video_bytes.py)
    eval_fn = make_inverse_eval(model)
    accs = [
        float(eval_fn(state.params, state.batch_stats,
                      val_b.get_batch(batch_size=min(args.batch_size,
                                                     len(val_b))))[1])
        for _ in range(10)
    ]
    print(f"Final val accuracy: {float(np.mean(accs)):.4f}")


if __name__ == "__main__":
    main()
