"""Classify probed red-light events (tools/r3_policy_redlight_probe.py
output) by stop-line OWNERSHIP: is the scored line the ego route's own
governing light (the first stop line the dense route crosses, inbound
direction matching the route), or a FOREIGN approach's line swept while
traversing a skewed junction?

CARLA scores only the light governing the ego's lane
(traffic_light.py:113-156); a criterion that leaks foreign lines inflates
red/km with infractions no policy behaviour can avoid — the signature is a
red rate flat across training (RESULTS.md Town03).

Usage:
  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
      python tools/r3_redlight_ownership.py /tmp/rl_probe.json [Town03]
"""
from __future__ import annotations

import json
import sys

import numpy as np

from gail_carla_tpu.train import make_scene

probe = json.load(open(sys.argv[1]))
town = sys.argv[2] if len(sys.argv) > 2 else probe.get("town", "Town03")
scene = make_scene({"town": town})

route_xy = np.asarray(scene.route_xy)    # (R, L, 2)
route_n = np.asarray(scene.route_n)
tl_stop = np.asarray(scene.tl_stop)      # (T, 2, 2)
tl_yaw = np.asarray(scene.tl_yaw)
tl_junction = np.asarray(scene.tl_junction)
tl_n = int(scene.tl_n)
center = 0.5 * (tl_stop[:, 0] + tl_stop[:, 1])


def seg_intersect(p, p2, a, b):
    """Vectorized proper segment intersection p->p2 vs a->b (broadcast)."""
    d1 = p2 - p
    d2 = b - a
    denom = d1[..., 0] * d2[..., 1] - d1[..., 1] * d2[..., 0]
    w = a - p
    t = (w[..., 0] * d2[..., 1] - w[..., 1] * d2[..., 0]) / np.where(
        np.abs(denom) < 1e-12, np.inf, denom
    )
    u = (w[..., 0] * d1[..., 1] - w[..., 1] * d1[..., 0]) / np.where(
        np.abs(denom) < 1e-12, np.inf, denom
    )
    return (t > 0) & (t < 1) & (u > 0) & (u < 1)


def route_crossings(r):
    """All (line idx, route arclength, route yaw at crossing) where dense
    route r crosses a live stop line."""
    n = int(route_n[r])
    pts = route_xy[r, :n]
    a, b = pts[:-1], pts[1:]
    seglen = np.linalg.norm(b - a, axis=-1)
    cum = np.concatenate([[0.0], np.cumsum(seglen)])
    hits = seg_intersect(
        a[:, None, :], b[:, None, :],
        tl_stop[None, :, 0], tl_stop[None, :, 1],
    )  # (n-1, T)
    hits[:, tl_n:] = False
    out = []
    for si, li in zip(*np.nonzero(hits)):
        yaw = np.arctan2(b[si, 1] - a[si, 1], b[si, 0] - a[si, 0])
        out.append((int(li), float(cum[si]), float(yaw)))
    out.sort(key=lambda x: x[1])
    return out


own_events, foreign_events = [], []
for ev in probe["events"]:
    r, li = ev["route"], ev["light"]
    crossings = route_crossings(r)
    # the route-owned light nearest the event's position
    exy = center[li]
    n = int(route_n[r])
    pts = route_xy[r, :n]
    d_along = np.linalg.norm(pts - exy, axis=-1)
    s_event = float(
        np.concatenate(
            [[0.0], np.cumsum(np.linalg.norm(np.diff(pts, axis=0), -1))]
        )[np.argmin(d_along)]
    )
    same = [c for c in crossings if c[0] == li]
    aligned = None
    if same:
        # scored line IS crossed by the route: own iff inbound dir matches
        yaw_at = same[0][2]
        dyaw = np.degrees(
            np.abs(
                np.arctan2(
                    np.sin(tl_yaw[li] - yaw_at), np.cos(tl_yaw[li] - yaw_at)
                )
            )
        )
        aligned = float(dyaw)
        own = dyaw < 45.0
    else:
        own = False
    rec = dict(ev, own=bool(own), route_yaw_vs_line_deg=aligned,
               crossed_by_route=bool(same),
               junction_lines_on_route=[
                   c[0] for c in crossings
                   if tl_junction[c[0]] == tl_junction[li]
               ])
    (own_events if own else foreign_events).append(rec)

print(json.dumps({
    "n_own": len(own_events), "n_foreign": len(foreign_events),
    "own": own_events, "foreign": foreign_events,
}, indent=1))
print(
    f"# {len(own_events)} own-light events (behaviour), "
    f"{len(foreign_events)} foreign/uncrossed-line events (criterion leak)",
    file=sys.stderr,
)
