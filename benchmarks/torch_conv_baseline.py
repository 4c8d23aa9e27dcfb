"""PyTorch-CPU baseline for the CONV families, written from scratch.

Round-2 VERDICT "missing #2": the >=10x bar was proven only for the
flagship MLP config; the conv families had TPU numbers but no torch-CPU
counterpart. This measures per-step torch-CPU train throughput for:

  * a conv Euclidean VAE matching models/vae_euclidean.py's stack
    (reference /root/reference/hyperbolic_vae/models/vae_euclidean.py:31-87:
    Conv(c,s2)/Conv(c)/Conv(2c,s2)/Conv(2c)/Conv(2c,s2) encoder, mirrored
    ConvT decoder, sum-MSE + analytic KL), and
  * a conv hyperbolic image VAE matching models/vae_hyperbolic.py's
    stack (reference vae_hyperbolic.py:38-123: 16/32/32 s2 convs,
    gyroplane decoder-first, wrapped-normal MC KL),

with the reference's per-step Python dispatch structure (one Adam step
per batch). Independent implementation — geoopt is not installed; the
hyperbolic pieces reuse benchmarks/torch_baseline.py's TorchBall.

Run: python benchmarks/torch_conv_baseline.py  (CPU, a few minutes)
Writes BASELINE_TORCH_CONV.json via bench_conv.get_torch_conv_baseline.
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

import torch
import torch.nn as nn
import torch.nn.functional as F

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

from benchmarks.torch_baseline import TorchBall  # noqa: E402


class ConvEuclideanVAE(nn.Module):
    def __init__(self, hidden: int = 64, latent: int = 2, shape=(3, 32, 32)):
        super().__init__()
        c, (C, H, W) = hidden, shape
        self.enc = nn.Sequential(
            nn.Conv2d(C, c, 3, 2, 1), nn.GELU(),
            nn.Conv2d(c, c, 3, 1, 1), nn.GELU(),
            nn.Conv2d(c, 2 * c, 3, 2, 1), nn.GELU(),
            nn.Conv2d(2 * c, 2 * c, 3, 1, 1), nn.GELU(),
            nn.Conv2d(2 * c, 2 * c, 3, 2, 1), nn.GELU(),
        )
        flat = 2 * c * (H // 8) * (W // 8)
        self.mu = nn.Linear(flat, latent)
        self.log_var = nn.Linear(flat, latent)
        self.dec_in = nn.Linear(latent, flat)
        self.dec = nn.Sequential(
            nn.ConvTranspose2d(2 * c, 2 * c, 3, 2, 1, output_padding=1), nn.GELU(),
            nn.Conv2d(2 * c, 2 * c, 3, 1, 1), nn.GELU(),
            nn.ConvTranspose2d(2 * c, c, 3, 2, 1, output_padding=1), nn.GELU(),
            nn.Conv2d(c, c, 3, 1, 1), nn.GELU(),
            nn.ConvTranspose2d(c, C, 3, 2, 1, output_padding=1),
        )
        self.c, self.shape = c, shape

    def loss(self, x):
        h = self.enc(x).flatten(1)
        mu, log_var = self.mu(h), self.log_var(h)
        z = mu + torch.randn_like(mu) * torch.exp(0.5 * log_var)
        C, H, W = self.shape
        h = F.gelu(self.dec_in(z)).view(-1, 2 * self.c, H // 8, W // 8)
        x_hat = torch.tanh(self.dec(h))
        recon = F.mse_loss(x_hat, x, reduction="sum")
        kld = -0.5 * torch.sum(1 + log_var - mu.pow(2) - log_var.exp())
        return recon + kld


class ConvHyperbolicVAE(nn.Module):
    def __init__(self, latent: int = 2, shape=(3, 32, 32), c: float = 1.0):
        super().__init__()
        C, H, W = shape
        self.ball = TorchBall(c)
        self.enc = nn.Sequential(
            nn.Conv2d(C, 16, 3, 2, 1), nn.GELU(),
            nn.Conv2d(16, 32, 3, 2, 1), nn.GELU(),
            nn.Conv2d(32, 32, 3, 2, 1), nn.GELU(),
        )
        flat = 32 * (H // 8) * (W // 8)
        self.mu = nn.Linear(flat, latent)
        self.log_var = nn.Linear(flat, latent)
        # gyroplane decoder-first: points on the ball + per-plane scale
        self.planes = nn.Parameter(torch.randn(flat, latent) * 1e-2)
        self.plane_bias = nn.Parameter(torch.zeros(flat))
        self.dec = nn.Sequential(
            nn.ConvTranspose2d(32, 32, 3, 2, 1, output_padding=1), nn.GELU(),
            nn.Conv2d(32, 32, 3, 1, 1), nn.GELU(),
            nn.ConvTranspose2d(32, 16, 3, 2, 1, output_padding=1), nn.GELU(),
            nn.Conv2d(16, 16, 3, 1, 1), nn.GELU(),
            nn.ConvTranspose2d(16, C, 3, 2, 1, output_padding=1),
        )
        self.shape = shape

    def dist2planes(self, z):
        # signed gyroplane distances (same math family as the jax
        # ops/gyroplane.py formulation; exactness vs jax is irrelevant
        # here - this is a THROUGHPUT baseline, not a parity arm)
        p = torch.tanh(self.planes)  # keep points inside the ball
        diff = self.ball.mobius_add(-p.unsqueeze(0), z.unsqueeze(1))
        d = diff.norm(dim=-1).clamp(max=1 - 1e-6)
        return 2.0 * torch.atanh(d) + self.plane_bias

    def loss(self, x):
        ball = self.ball
        h = self.enc(x).flatten(1)
        mu = ball.expmap0(self.mu(h))
        scale = torch.exp(0.5 * self.log_var(h)).clamp(1e-3, 10.0)
        # wrapped normal rsample + MC KL (1 sample)
        v = torch.randn_like(mu) * scale
        z = ball.expmap(mu, v * 2.0 / (ball.sqrt_c * ball.lambda_x(mu)))
        log_q = (
            -0.5 * (v / scale).pow(2).sum(-1)
            - scale.log().sum(-1)
            - 0.5 * mu.shape[-1] * math.log(2 * math.pi)
            - ball.logdetexp(mu, z).squeeze(-1)
        )
        v0 = ball.logmap0(z) if hasattr(ball, "logmap0") else ball.logmap(
            torch.zeros_like(z), z)
        log_p = (
            -0.5 * v0.pow(2).sum(-1)
            - 0.5 * mu.shape[-1] * math.log(2 * math.pi)
            - ball.logdetexp(torch.zeros_like(z), z).squeeze(-1)
        )
        kl = torch.sum(log_q - log_p)
        C, H, W = self.shape
        hdec = F.gelu(self.dist2planes(z)).view(-1, 32, H // 8, W // 8)
        x_hat = torch.sigmoid(self.dec(hdec))
        recon = F.mse_loss(x_hat, x, reduction="sum")
        return recon + kl


def bench_per_step(model, batch: int = 256, n: int = 2048, warmup: int = 3,
                   timed_steps: int = 20) -> dict:
    torch.manual_seed(0)
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    x = torch.rand(n, 3, 32, 32)
    steps = n // batch

    def one_epoch():
        perm = torch.randperm(n)
        for s in range(steps):
            xb = x[perm[s * batch:(s + 1) * batch]]
            opt.zero_grad()
            loss = model.loss(xb)
            loss.backward()
            opt.step()
        return float(loss.detach())

    for _ in range(warmup):
        loss = one_epoch()
    t0 = time.perf_counter()
    done = 0
    while done < timed_steps:
        loss = one_epoch()
        done += steps
    dt = time.perf_counter() - t0
    return {
        "samples_per_sec": round(done * batch / dt, 1),
        "step_ms": round(dt / done * 1000, 2),
        "batch": batch,
        "final_loss": loss,
        "threads": torch.get_num_threads(),
    }


def measure(batch: int = 256) -> dict:
    out = {"what": "torch-CPU per-step conv baselines (torch_conv_baseline.py)"}
    out["euclidean_vae"] = bench_per_step(ConvEuclideanVAE(hidden=64), batch)
    print(json.dumps({"euclidean_vae": out["euclidean_vae"]}),
          file=sys.stderr, flush=True)
    out["hyperbolic_image_vae"] = bench_per_step(ConvHyperbolicVAE(), batch)
    print(json.dumps({"hyperbolic_image_vae": out["hyperbolic_image_vae"]}),
          file=sys.stderr, flush=True)
    return out


if __name__ == "__main__":
    result = measure()
    (REPO_ROOT / "BASELINE_TORCH_CONV.json").write_text(json.dumps(result, indent=2))
    print(json.dumps(result))
