"""Crawl-ordering parity (SURVEY.md §3): the engine's ordered selection must
equal a sequential reference-model BFS run on the same world.

The model below independently reimplements the reference's control flow —
worklist BFS appending children in document order (tracker.py:31-71),
entries collected in sitemap document order — using only the scalar parser.
The engine's order columns (site_seq, depth, path, sitemap_pos) must sort
to exactly this sequence.
"""

import pytest
from pyspark.sql import functions as F

from spark_frontier.pipeline.crawl import load_world
from spark_frontier.pipeline.synth import gen_world
from spark_frontier.sitemap.expand import expand_sitemap_tree
from spark_frontier.sitemap.parser import decode_content, parse_sitemap_document


@pytest.fixture(scope="module")
def world_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ordworld"))
    gen_world(d, n_sites=6, urlsets_per_site=3, urls_per_urlset=20)
    return d


def reference_model_order(pages: dict[str, bytes], seeds: list[tuple[str, str]]):
    """Sequential BFS exactly like tracker.py:31-71 (worklist + processed
    set, children appended in doc order), per site in seed order."""
    out = []
    for site_id, root in seeds:
        worklist = [root]
        processed = {root}
        while worklist:
            sm_url = worklist.pop(0)  # FIFO → BFS
            content = pages.get(sm_url)
            if content is None:
                continue
            entries, _ = parse_sitemap_document(decode_content(content))
            for e in entries:
                if e.get("is_index"):
                    child = e["loc"]
                    if child not in processed:
                        processed.add(child)
                        worklist.append(child)
                else:
                    out.append((site_id, e["loc"]))
    return out


def test_selection_order_matches_reference_model(spark, world_dir):
    world = load_world(spark, world_dir)
    sites = world["sites"].filter(F.col("is_active")).orderBy("site_seq")
    seeds_rows = sites.select("site_id", "site_seq", "sitemap_url").collect()
    entries = expand_sitemap_tree(
        sites.select("site_id", "site_seq", "sitemap_url"),
        world["sitemap_pages"],
    )
    engine_order = [
        (r["site_id"], r["loc"])
        for r in entries.orderBy(
            "site_seq", "depth", "path", "sitemap_pos"
        ).collect()
    ]
    pages = {
        r["sitemap_url"]: r["content"]
        for r in world["sitemap_pages"].collect()
    }
    model_order = reference_model_order(
        pages, [(r["site_id"], r["sitemap_url"]) for r in seeds_rows]
    )
    assert engine_order == model_order


def test_cycle_sitemap_visited_once(spark, world_dir):
    """The cycle child (site2 index pointing back at root) must not loop
    (tracker.py:49-51 seen-set)."""
    world = load_world(spark, world_dir)
    sites = world["sites"].filter(F.col("is_active"))
    entries = expand_sitemap_tree(
        sites.select("site_id", "site_seq", "sitemap_url"),
        world["sitemap_pages"],
    )
    # every (sitemap_url, loc) appears exactly once
    dupes = (
        entries.groupBy("sitemap_url", "loc").count().filter(F.col("count") > 1)
    )
    assert dupes.count() == 0
