"""Measure the reference-equivalent PyTorch double-DQN train step on this
host's CPU (no CUDA GPU exists in this environment; the reference trained
on one). Mirrors the reference hot loop: 3x ResNet18 forwards (before,
after online, after target) + loss + backward + Adam at batch 16
(/root/reference/train_q_network.py:126-181,98).

Writes the measured frames/sec to stdout; recorded in BASELINE.md and used
as bench.py's vs_baseline denominator (with provenance noted).
"""

import sys
import time

sys.path.insert(0, ".")

import torch

from tests.torch_ref import TorchHabitatDQN


def main(batch=16, steps=5, size=224):
    torch.manual_seed(0)
    torch.set_num_threads(torch.get_num_threads())
    model = TorchHabitatDQN(3, extra_capacity=True, panorama=False).finish(size)
    target = TorchHabitatDQN(3, extra_capacity=True, panorama=False).finish(size)
    target.load_state_dict(model.state_dict())
    target.eval()
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)

    before = torch.randn(batch, 1, 3, size, size)
    after = torch.randn(batch, 1, 3, size, size)
    act = torch.randint(0, 3, (batch,))
    rew = (torch.rand(batch, 5) < 0.1).float()
    term = rew.clone()

    def step():
        opt.zero_grad()
        qb = model(before)
        q_b = qb.gather(2, act.view(-1, 1, 1).expand(-1, 5, 1)).squeeze(2)
        with torch.no_grad():
            qa_t = target(after)
        qa_o = model(after)
        best = qa_o.argmax(-1)
        q_a = qa_t.gather(2, best.unsqueeze(2)).squeeze(2).detach() * (1 - term)
        tgt = torch.clamp(rew + 0.99 * q_a, 0, 1)
        loss = (0.5 * (q_b - tgt) ** 2).mean()
        loss.backward()
        opt.step()
        return loss.item()

    step()  # warmup
    t0 = time.time()
    for _ in range(steps):
        step()
    dt = time.time() - t0
    fps = batch * steps / dt
    print(f"torch_cpu_frames_per_sec: {fps:.2f}  ({dt/steps:.2f}s/step, batch {batch})")


if __name__ == "__main__":
    main()
