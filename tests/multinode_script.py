"""Two-virtual-node crawl: plasma frontier across separate object
stores + locality measurement (VERDICT r4 #7).

Run as a SUBPROCESS (it owns its own Ray cluster):
    python tests/multinode_script.py
Prints one JSON line:
    {"ok": true, "stored": N, "rounds": R, "parts": P,
     "consumptions": C, "local": L, "remote": M, "local_frac": f,
     "nodes": 2}

What it evidences:
- the plasma-frontier mode (spill parts as Ray objects) works when the
  producing actor's object store and the consuming actor's object
  store are DIFFERENT nodes (lifetimes, cross-store fetch, det-mode
  admission key splits all cross the node boundary);
- the hist-based part routing keeps most consumption LOCAL (a part's
  rows are mostly same-host links of pages its producer fetched, and
  the bucket->actor LUT is stable), so a real N-node cluster does not
  degrade into a W-way full-frontier broadcast.
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import ray
    from ray.cluster_utils import Cluster

    cluster = Cluster(
        initialize_head=True,
        head_node_args={"num_cpus": 4, "object_store_memory": 400 * 1024 * 1024},
    )
    cluster.add_node(num_cpus=4, object_store_memory=400 * 1024 * 1024)
    ray.init(address=cluster.address, include_dashboard=False)
    assert len([n for n in ray.nodes() if n.get("Alive", True)]) == 2, "expected 2 virtual nodes"

    from polipus_ray.config import CrawlConfig
    from polipus_ray.frontier.engine import CrawlEngine
    from polipus_ray.oracle.simulator import simulate_crawl, web_table_to_dict
    from polipus_ray.synth.world import WorldSpec, make_web_table, robots_bodies, seed_urls, write_world

    docs = "/root/testdata/sf0.001/documents.parquet"
    spec = WorldSpec(redirect_mod=23)
    world_dir = tempfile.mkdtemp(prefix="mn-world-")
    write_world(world_dir, docs, spec)
    run_dir = tempfile.mkdtemp(prefix="mn-run-")

    cfg = CrawlConfig(
        depth_limit=False,
        obey_robots_txt=True,
        small_round_threshold=0,  # force remote execution
        workers=8,  # spans both 4-cpu nodes
        checkpoint=False,
        plasma_frontier=True,  # lift the _single_node() gate
        route_telemetry=True,
    )
    eng = CrawlEngine(world_dir, cfg, run_dir)
    eng.warm_pool()
    actors = eng._fetch_actors or []
    node_of = ray.get([a.node_id.remote() for a in actors])
    assert len(set(node_of)) == 2, f"fetch pool should span both nodes, got {set(node_of)}"
    res = eng.crawl()

    # exactness across nodes: stored set + FIFO order vs the simulator
    web = web_table_to_dict(make_web_table(docs, spec, with_images=False))
    sim = simulate_crawl(web, robots_bodies(spec), seed_urls(spec), cfg)
    pt = eng.pages_table(columns=["uuid", "url", "seq"])
    order = [u for _, u in sorted(zip(pt["seq"].to_pylist(), pt["url"].to_pylist()))]
    assert set(pt["uuid"].to_pylist()) == set(sim.stored.keys()), "stored set mismatch across nodes"
    assert order == sim.order, "crawl order mismatch across nodes"

    # locality: pre-dispatch part locations vs consumer actor nodes
    parts = consumptions = local = remote = 0
    for rec in eng.route_log:
        for p in rec["parts"]:
            parts += 1
            for a in p["consumers"]:
                consumptions += 1
                if node_of[a] in p["nodes"]:
                    local += 1
                else:
                    remote += 1
    out = {
        "ok": True,
        "stored": res["stored"],
        "rounds": res["rounds"],
        "parts": parts,
        "consumptions": consumptions,
        "local": local,
        "remote": remote,
        "local_frac": round(local / consumptions, 3) if consumptions else None,
        "nodes": 2,
        "actor_nodes": sorted(set(node_of)),
    }
    print(json.dumps(out))
    ray.shutdown()
    cluster.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
