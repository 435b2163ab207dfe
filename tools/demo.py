#!/usr/bin/env python3
"""Demo runner — CLI analogue of the reference's demo pages
(Player/treeDemo.html: one player; Player/storyDemo.html: six
simultaneous players across backend/render configurations, the de-facto
stress test; fps/score overlay mp4.js:805-955).

  demo.py tree  [-B backend] [-R render] file.(mp4|h264)
  demo.py story [-B backend] file.(mp4|h264)

tree:  one player, per-second fps lines + final score.
story: six concurrent players (cpu+yuv, cpu+rgb_int, backend+yuv,
       backend+rec601, backend+rec709, backend+rgb_int) on threads —
       the multi-player matrix of storyDemo.html.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _load(fname):
    with open(fname, "rb") as f:
        data = f.read()
    if fname.endswith(".mp4") or data[4:8] == b"ftyp":
        return ("mp4", data)
    return ("annexb", data)


def _play_one(kind, data, backend, render, label="player"):
    from broadway_tpu.player.player import MP4Player, Player

    t0 = time.time()
    if kind == "mp4":
        p = MP4Player(data, backend=backend, render=render).play()
    else:
        p = Player(backend=backend, render=render)
        p.decode(data)
        p.end_of_stream()
    dt = time.time() - t0
    n = p.stats.total_frames
    fps = n / dt if dt > 0 else 0.0
    print(f"[{label}] backend={backend} render={render}: {n} frames in "
          f"{dt:.2f}s -> {fps:.1f} fps (score={fps:.1f})")
    return n, fps


def tree(argv):
    backend, render, fname = "cpu", "yuv", None
    for a in argv:
        if a.startswith("-B"):
            backend = a[2:]
        elif a.startswith("-R"):
            render = a[2:]
        else:
            fname = a
    kind, data = _load(fname)
    _play_one(kind, data, backend, render, "tree")
    return 0


def story(argv):
    import threading
    backend, fname = "cpu", None
    for a in argv:
        if a.startswith("-B"):
            backend = a[2:]
        else:
            fname = a
    kind, data = _load(fname)
    configs = [("cpu", "yuv"), ("cpu", "rgb_int"),
               (backend, "yuv"), (backend, "rec601"),
               (backend, "rec709"), (backend, "rgb_int")]
    results = [None] * len(configs)

    def run(i, be, rd):
        results[i] = _play_one(kind, data, be, rd, f"story{i}")

    t0 = time.time()
    threads = [threading.Thread(target=run, args=(i, be, rd))
               for i, (be, rd) in enumerate(configs)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.time() - t0
    total = sum(r[0] for r in results if r)
    print(f"[story] 6 players, {total} frames total in {dt:.2f}s "
          f"({total / dt:.1f} fps aggregate)")
    return 0


def main(argv):
    if len(argv) < 3 or argv[1] not in ("tree", "story"):
        print(__doc__)
        return 1
    return {"tree": tree, "story": story}[argv[1]](argv[2:])


if __name__ == "__main__":
    sys.exit(main(sys.argv))
