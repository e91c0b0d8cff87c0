"""Analytic roofline for the exact 720p batch-4 serving graph on v5e.

Walks the RIFE forward pass (models/ifnet.py + models/refine.py) stage
by stage and prints, per stage: MACs, minimum HBM bytes moved (each
tensor read/written once, bf16 activations, f32 flow), and the implied
time floor at v5e peaks (197 TF/s bf16 MXU, 819 GB/s HBM).  The floor a
stage CAN reach is max(compute, traffic); gathers (warps) execute on
the VPU, whose practical ceiling we take from the measured best
(~0.55 us per (8,128)-subtile-channel for v5, tools/r3_exp3.py) rather
than a paper number.

This is the evidence base for docs/PERFORMANCE.md "Roofline" — run
anywhere (pure arithmetic, no devices).
"""
import sys

PEAK_TF = 197e12       # v5e bf16 dense MXU peak
PEAK_BW = 819e9        # v5e HBM bandwidth
B, H, W = 4, 736, 1280

rows = []


def stage(name, macs=0.0, rbytes=0.0, wbytes=0.0, note=""):
    comp = 2 * macs / PEAK_TF
    traf = (rbytes + wbytes) / PEAK_BW
    rows.append((name, macs, rbytes + wbytes, comp * 1e3, traf * 1e3,
                 max(comp, traf) * 1e3, note))


def conv(name, h, w, cin, cout, k=3, stride=1, n=B, note=""):
    ho, wo = h // stride, w // stride
    macs = n * ho * wo * cin * cout * k * k
    rb = n * (h * w * cin + k * k * cin * cout) * 2
    wb = n * ho * wo * cout * 2
    stage(name, macs, rb, wb, note)
    return ho, wo


def warp(name, h, w, c, n=B, flow_dtype=4, note=""):
    # reads plane (bf16) + flow (f32) + scalars; writes plane (bf16)
    rb = n * (h * w * c * 2 + h * w * 2 * flow_dtype)
    wb = n * h * w * c * 2
    stage(name, 0.0, rb, wb, note)


def resize(name, h, w, c, ho, wo, n=B, dt=2, note=""):
    stage(name, 0.0, n * h * w * c * dt, n * ho * wo * c * dt, note)


# ---- IFBlocks (block_channels 240/150/90, scale 4/2/1) -----------------
for i, (cin, c, s) in enumerate([(6, 240, 4), (17, 150, 2), (17, 90, 1)]):
    h, w = H // s, W // s
    if s != 1:
        resize(f"block{i} input downsample", H, W, cin, h, w)
    hh, ww = conv(f"block{i} conv0a {cin}->{c//2} s2", h, w, cin + (4 if i else 0), c // 2, stride=2)
    hh, ww = conv(f"block{i} conv0b {c//2}->{c} s2", hh, ww, c // 2, c, stride=2)
    for j in range(8):
        conv(f"block{i} convblock{j} {c}x{c}", hh, ww, c, c)
    # lastconv k4s2 deconv -> 5ch at 2x
    macs = B * (hh * 2) * (ww * 2) * c * 5 * 4  # 4 taps contribute per output px
    stage(f"block{i} lastconv deconv {c}->5", macs,
          B * hh * ww * c * 2, B * hh * 2 * ww * 2 * 5 * 2)
    resize(f"block{i} flow upsample x{s*2}", hh * 2, ww * 2, 5, H, W)
    warp(f"level{i} image warp2 (2x3ch)", H, W, 6)

# ---- Contextnet pair (stacked 2N) --------------------------------------
h, w = H, W
cin = 3
for lvl, cout in enumerate([16, 32, 64, 128]):
    hh, ww = conv(f"ctx conv{lvl}a {cin}->{cout} s2", h, w, cin, cout, stride=2, n=2 * B)
    conv(f"ctx conv{lvl}b {cout}x{cout}", hh, ww, cout, cout, n=2 * B)
    warp(f"ctx warp level{lvl} {cout}ch", hh, ww, cout, n=2 * B)
    resize(f"ctx flow halve L{lvl}", h, w, 2, hh, ww, n=2 * B, dt=4)
    h, w, cin = hh, ww, cout

# ---- U-Net -------------------------------------------------------------
h, w = H, W
specs = [("down0", 17, 32, 2), ("down1", 64, 64, 2), ("down2", 128, 128, 2),
         ("down3", 256, 256, 2)]
for name, cin, cout, s in specs:
    hh, ww = conv(f"unet {name}a {cin}->{cout} s{s}", h, w, cin, cout, stride=s)
    conv(f"unet {name}b {cout}x{cout}", hh, ww, cout, cout)
    h, w = hh, ww
for name, cin, cout in [("up0", 512, 256), ("up1", 384, 128),
                        ("up2", 192, 64), ("up3", 96, 16)]:
    macs = B * (h * 2) * (w * 2) * cin * cout * 4
    stage(f"unet {name} deconv {cin}->{cout}", macs,
          B * h * w * cin * 2, B * h * 2 * w * 2 * cout * 2)
    h, w = h * 2, w * 2
conv("unet final conv 16->3", H, W, 16, 3)

# ---- totals ------------------------------------------------------------
tot_macs = sum(r[1] for r in rows)
tot_bytes = sum(r[2] for r in rows)
tot_floor = sum(r[5] for r in rows)

hdr = f"{'stage':38s} {'GMAC':>8s} {'MB':>8s} {'comp ms':>8s} {'traf ms':>8s} {'floor ms':>9s}"
print(hdr)
print("-" * len(hdr))
groups = {}
for name, macs, byts, cms, tms, fms, note in rows:
    if "-v" in sys.argv:
        print(f"{name:38s} {macs/1e9:8.2f} {byts/1e6:8.1f} {cms:8.3f} {tms:8.3f} {fms:9.3f}")
    key = name.split()[0]
    g = groups.setdefault(key, [0.0, 0.0, 0.0])
    g[0] += macs; g[1] += byts; g[2] += fms
print("---- grouped ----")
for key, (macs, byts, fms) in groups.items():
    print(f"{key:38s} {macs/1e9:8.2f} {byts/1e6:8.1f} {'':8s} {'':8s} {fms:9.3f}")
print("-" * len(hdr))
print(f"{'TOTAL (batch-4 iter)':38s} {tot_macs/1e9:8.2f} {tot_bytes/1e6:8.1f} {'':8s} {'':8s} {tot_floor:9.3f}")
print(f"\nper-frame: {tot_macs*2/B/1e9:.1f} GFLOP; ideal-floor fps/chip = "
      f"{B/(tot_floor/1e3):.0f}")
