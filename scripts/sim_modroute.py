"""Host simulation: can lane-compaction and per-row rotation fold into ONE
7-round modular (ring) routing pass?

Element i in a 128-lane row with keep[i] and exclusive rank[i] must land at
lane (rank[i] + S) mod 128 (S = row's stream start offset).  Right-rotation
distance dR[i] = (rank[i] + S - i) mod 128.  Round b: elements whose
remaining distance has bit b rotate right by 2^b, carried by the same
arrive/moving bookkeeping as the existing compaction.

Checks exhaustively-ish (random masks x random S) that the arriving-element
routing never collides with an already-arrived element and the final run is
exactly the kept elements in order starting at lane S.
"""
import numpy as np

L = 128


def route(x, keep, S):
    lane = np.arange(L)
    rank = np.cumsum(keep) - keep  # exclusive
    d = np.where(keep == 1, (rank + S - lane) % L, 0)
    arrived = keep.copy().astype(bool)  # live payload markers
    live = keep.copy().astype(bool)
    x = x.copy()
    d = d.copy()
    for b in range(7):
        s = 1 << b
        dm = np.roll(d, s)
        livem = np.roll(live, s)
        arrive = ((dm & s) != 0) & livem
        moving = (d & s) != 0
        # collision check: an arriving element lands on a slot whose element
        # is NOT itself moving away AND is live with remaining distance 0
        # -> that would clobber a settled element
        clobber = arrive & live & (~moving) & (d == 0)
        if clobber.any():
            return None, f"clobber at round {b}: lanes {np.where(clobber)[0]}"
        xm = np.roll(x, s)
        x = np.where(arrive, xm, x)
        newlive = np.where(arrive, True, np.where(moving, False, live))
        d = np.where(arrive, dm - s, np.where(moving, 0, d))
        live = newlive
    return x, None


def main():
    rng = np.random.default_rng(0)
    fails = 0
    for trial in range(20000):
        dens = rng.random()
        keep = (rng.random(L) < dens).astype(np.int64)
        S = int(rng.integers(0, L))
        x = np.arange(1, L + 1)
        got, err = route(x, keep, S)
        if err is not None:
            fails += 1
            if fails < 5:
                print(f"trial {trial} dens={dens:.2f} S={S}: {err}")
            continue
        cnt = int(keep.sum())
        want_vals = x[keep == 1]
        lanes = (np.arange(cnt) + S) % L
        ok = np.array_equal(got[lanes], want_vals)
        if not ok:
            fails += 1
            if fails < 5:
                print(f"trial {trial} dens={dens:.2f} S={S}: wrong values")
                print("  got ", got[lanes][:16], "want", want_vals[:16])
    print(f"fails: {fails}/20000")


if __name__ == "__main__":
    main()
