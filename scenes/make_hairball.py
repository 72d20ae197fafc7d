"""Generate scenes/assets/hairball.hair: fur fibers on a sphere."""
import numpy as np

rng = np.random.default_rng(7)
n_fibers, segs = 1200, 6
out = []
for _ in range(n_fibers):
    u = rng.uniform(size=2)
    z = 1 - 2 * u[0]
    r = np.sqrt(max(1 - z * z, 0))
    phi = 2 * np.pi * u[1]
    root = np.array([r * np.cos(phi), r * np.sin(phi), z])
    d = root.copy()
    p = root * 0.95
    fiber = [p.copy()]
    grav = np.array([0, 0, -0.25])
    for s in range(segs):
        d = d + rng.normal(scale=0.25, size=3) + grav * 0.3
        d /= np.linalg.norm(d)
        p = p + d * 0.12
        fiber.append(p.copy())
    out.append(fiber)
with open("assets/hairball.hair", "w") as f:
    for fib in out:
        for p in fib:
            f.write(f"{p[0]:.5f} {p[1]:.5f} {p[2]:.5f}\n")
        f.write("\n")
print("wrote", len(out), "fibers")
