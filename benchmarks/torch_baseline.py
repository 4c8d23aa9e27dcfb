"""PyTorch-CPU baseline for the flagship config, written from scratch.

The reference stack is torch-CPU wheels + pytorch-lightning with
devices=1 (SURVEY section 0); geoopt is not installed in this image, so
this is an independent torch implementation of the same math (wrapped
normal on the Poincare ball + gyroplane decoder + per-step Adam) used
ONLY to measure baseline samples/sec for bench.py's ``vs_baseline``.
It mirrors the reference's per-step Python dispatch structure (one
optimizer step per DataLoader batch) — precisely the overhead the
TPU full-epoch-jit design removes.
"""

from __future__ import annotations

import math
import time

import torch
import torch.nn as nn
import torch.nn.functional as F

MIN_NORM = 1e-15


class TorchBall:
    def __init__(self, c: float = 1.0):
        self.c = c
        self.sqrt_c = math.sqrt(c)

    def lambda_x(self, x):
        return 2.0 / (1.0 - self.c * x.pow(2).sum(-1, keepdim=True)).clamp_min(MIN_NORM)

    def mobius_add(self, x, y):
        c = self.c
        x2 = x.pow(2).sum(-1, keepdim=True)
        y2 = y.pow(2).sum(-1, keepdim=True)
        xy = (x * y).sum(-1, keepdim=True)
        num = (1 + 2 * c * xy + c * y2) * x + (1 - c * x2) * y
        return num / (1 + 2 * c * xy + c * c * x2 * y2).clamp_min(MIN_NORM)

    def expmap(self, x, u):
        u_norm = u.norm(dim=-1, keepdim=True).clamp_min(MIN_NORM)
        second = (
            torch.tanh(self.sqrt_c * self.lambda_x(x) * u_norm / 2)
            * u
            / (self.sqrt_c * u_norm)
        )
        # project like the JAX PoincareBall.expmap (and geoopt's layers /
        # optimizer, which projx throughout the reference's training path):
        # without it mu reaches |mu| -> 1 where the f32 logmap/expmap
        # roundtrip noise is amplified by lambda ~ 1/(1-|mu|^2) and log_q
        # explodes to -1e7 (observed divergence mode of this baseline)
        return self.project(self.mobius_add(x, second))

    def expmap0(self, u):
        u_norm = u.norm(dim=-1, keepdim=True).clamp_min(MIN_NORM)
        return self.project(torch.tanh(self.sqrt_c * u_norm) * u / (self.sqrt_c * u_norm))

    def logmap(self, x, y):
        sub = self.mobius_add(-x, y)
        sub_norm = sub.norm(dim=-1, keepdim=True).clamp_min(MIN_NORM)
        return (
            2.0
            / (self.sqrt_c * self.lambda_x(x))
            * torch.atanh((self.sqrt_c * sub_norm).clamp(max=1 - 1e-6))
            * sub
            / sub_norm
        )

    def dist(self, x, y):
        sub_norm = self.mobius_add(-x, y).norm(dim=-1, keepdim=True)
        return 2.0 / self.sqrt_c * torch.atanh((self.sqrt_c * sub_norm).clamp(max=1 - 1e-6))

    def transp0(self, y, v):
        return v * (1.0 - self.c * y.pow(2).sum(-1, keepdim=True)).clamp_min(MIN_NORM)

    def transp0back(self, y, v):
        return v * self.lambda_x(y) / 2.0

    def logdetexp(self, x, y):
        d = self.dist(x, y)
        t = (self.sqrt_c * d).clamp_min(1e-7)
        dim = x.shape[-1]
        return (dim - 1) * (torch.sinh(t).log() - math.log(self.sqrt_c) - d.clamp_min(1e-7).log())

    def project(self, x):
        # geoopt's f32 boundary margin (same 4e-3 as the JAX PoincareBall)
        max_norm = (1.0 - 4e-3) / self.sqrt_c
        norm = x.norm(dim=-1, keepdim=True).clamp_min(MIN_NORM)
        return torch.where(norm > max_norm, x / norm * max_norm, x)

    def dist0(self, x):
        norm = x.norm(dim=-1, keepdim=True)
        return 2.0 / self.sqrt_c * torch.atanh((self.sqrt_c * norm).clamp(max=1 - 1e-6))

    def max_chart_radius(self):
        # same value as the JAX arm's wrapped_normal.max_chart_radius
        return 2.0 / self.sqrt_c * math.atanh(1.0 - 4e-3)

    def gyration(self, u, v, w):
        # gyr[u, v]w = (-(u (+) v)) (+) (u (+) (v (+) w))
        return self.mobius_add(
            -self.mobius_add(u, v), self.mobius_add(u, self.mobius_add(v, w))
        )

    def transp(self, x, y, v):
        return self.gyration(y, -x, v) * self.lambda_x(x) / self.lambda_x(y)

    def dist2plane(self, x, p, a, signed=True):
        diff = self.mobius_add(-p, x)
        diff_norm2 = diff.pow(2).sum(-1).clamp_min(MIN_NORM)
        sc = (diff * a).sum(-1)
        if not signed:
            sc = sc.abs()
        a_norm = a.norm(dim=-1).clamp_min(MIN_NORM)
        num = 2 * self.sqrt_c * sc
        denom = ((1 - self.c * diff_norm2) * a_norm).clamp_min(MIN_NORM)
        return torch.asinh(num / denom) / self.sqrt_c


class TorchGyroplaneVAE(nn.Module):
    def __init__(self, data_numel=784, latent=2, c=1.0, hidden=(64, 16)):
        super().__init__()
        self.ball = TorchBall(c)
        self.enc = nn.Sequential(
            nn.Linear(data_numel, hidden[0]), nn.GELU(), nn.Linear(hidden[0], hidden[1]), nn.GELU()
        )
        self.mu = nn.Linear(hidden[1], latent)
        self.scale = nn.Linear(hidden[1], latent)
        # gyroplane points live ON the ball (like the reference's geoopt
        # ManifoldParameter and the JAX mp_points): direction uniform on
        # the sphere, radius ~ N(0, 1), expmap0
        direction = torch.randn(hidden[1], latent)
        direction = direction / direction.norm(dim=-1, keepdim=True)
        radius = torch.randn(hidden[1], 1)
        self.mp_points = nn.Parameter(self.ball.expmap0(direction * radius))
        self.plane_bias = nn.Parameter(torch.rand(hidden[1]) * 2.0 - 1.0)
        self.dec = nn.Sequential(
            nn.GELU(), nn.Linear(hidden[1], hidden[0]), nn.GELU(), nn.Linear(hidden[0], data_numel), nn.Sigmoid()
        )

    def forward(self, x):
        ball = self.ball
        h = self.enc(x)
        mu = ball.expmap0(self.mu(h))
        # same posterior-scale floor/cap as the JAX arm (vae_gyroplane.py)
        scale = (F.softplus(self.scale(h)) + 1e-3).clamp(1e-3, 10.0)
        eps = torch.randn_like(scale)
        v = scale * eps
        # chart-radius truncation, same semantics as the JAX arm
        # (wrapped_normal_rsample_from_eps): samples never leave the
        # f32-faithful region, so log q(z) of own samples stays exact and
        # the MC-KL chart exploit (the reference's divergence mode) is
        # closed in BOTH arms
        r_allowed = (ball.max_chart_radius() - ball.dist0(mu)).clamp_min(1e-2).clamp(max=10.0)
        v_norm = v.norm(dim=-1, keepdim=True).clamp_min(1e-12)
        v = v * torch.minimum(torch.ones_like(v_norm), r_allowed / v_norm)
        v = v / 2.0
        z = ball.expmap(mu, ball.transp0(mu, v))
        pts = self.mp_points
        d = ball.dist2plane(z.unsqueeze(1), pts, pts, signed=True) + self.plane_bias
        x_hat = self.dec(d)
        return mu, scale, z, x_hat

    def loss(self, x):
        ball = self.ball
        mu, scale, z, x_hat = self(x)
        qx_z = torch.distributions.RelaxedBernoulli(
            temperature=torch.tensor(1.0), probs=x_hat.clamp(1e-6, 1 - 1e-6)
        )
        recon = -qx_z.log_prob(x.clamp(1e-6, 1 - 1e-6)).sum(-1)

        def log_prob(loc, s, value):
            v = ball.logmap(loc, value)
            u = ball.transp0back(loc, v) * 2.0
            norm_pdf = torch.distributions.Normal(torch.zeros_like(s), s).log_prob(u).sum(-1)
            return norm_pdf - ball.logdetexp(loc, value).squeeze(-1)

        log_q = log_prob(mu, scale, z)
        log_p = log_prob(torch.zeros_like(mu), torch.ones_like(scale), z)
        return (recon + (log_q - log_p)).mean()


class TorchRiemannianAdam(torch.optim.Optimizer):
    """Minimal Riemannian Adam with the semantics of geoopt.optim.
    RiemannianAdam (the reference's optimizer,
    /root/reference/hyperbolic_vae/models/vae_hyperbolic.py:235-248),
    written from scratch for the parity baseline: parameters named
    ``mp_*`` are Poincare-ball points (rgrad -> component_inner second
    moment -> expmap retraction -> momentum transport); everything else
    gets plain Adam."""

    def __init__(self, named_params, ball: TorchBall, lr=1e-3, betas=(0.9, 0.999), eps=1e-8):
        named_params = list(named_params)
        manifold = [p for n, p in named_params if n.split(".")[-1].startswith("mp_")]
        euclid = [p for n, p in named_params if not n.split(".")[-1].startswith("mp_")]
        groups = [
            {"params": euclid, "manifold": False},
            {"params": manifold, "manifold": True},
        ]
        super().__init__(groups, dict(lr=lr, betas=betas, eps=eps))
        self.ball = ball

    @torch.no_grad()
    def step(self, closure=None):
        for group in self.param_groups:
            b1, b2 = group["betas"]
            lr, eps = group["lr"], group["eps"]
            for p in group["params"]:
                if p.grad is None:
                    continue
                g = p.grad
                st = self.state[p]
                if not st:
                    st["step"] = 0
                    st["exp_avg"] = torch.zeros_like(p)
                    st["exp_avg_sq"] = torch.zeros_like(p)
                st["step"] += 1
                t = st["step"]
                m, v = st["exp_avg"], st["exp_avg_sq"]
                if group["manifold"]:
                    lam2 = self.ball.lambda_x(p).pow(2)
                    g = g / lam2  # egrad -> rgrad
                    m.mul_(b1).add_(g, alpha=1 - b1)
                    v.mul_(b2).add_(lam2 * g * g, alpha=1 - b2)  # component_inner
                    m_hat = m / (1 - b1**t)
                    v_hat = v / (1 - b2**t)
                    direction = m_hat / (v_hat.sqrt() + eps)
                    new_p = self.ball.project(self.ball.expmap(p, -lr * direction))
                    st["exp_avg"] = self.ball.transp(p, new_p, m)
                    p.copy_(new_p)
                else:
                    m.mul_(b1).add_(g, alpha=1 - b1)
                    v.mul_(b2).addcmul_(g, g, value=1 - b2)
                    m_hat = m / (1 - b1**t)
                    v_hat = v / (1 - b2**t)
                    p.add_(-lr * m_hat / (v_hat.sqrt() + eps))


def measure_samples_per_sec(batch_size=256, steps=30, warmup=5, data_numel=784) -> float:
    torch.manual_seed(0)
    torch.set_num_threads(torch.get_num_threads())
    model = TorchGyroplaneVAE(data_numel=data_numel)
    opt = TorchRiemannianAdam(model.named_parameters(), model.ball, lr=1e-3)
    x = torch.rand(batch_size, data_numel)
    for _ in range(warmup):
        opt.zero_grad()
        loss = model.loss(x)
        loss.backward()
        opt.step()
    t0 = time.perf_counter()
    for _ in range(steps):
        opt.zero_grad()
        loss = model.loss(x)
        loss.backward()
        opt.step()
    dt = time.perf_counter() - t0
    return batch_size * steps / dt


if __name__ == "__main__":
    print(measure_samples_per_sec())
