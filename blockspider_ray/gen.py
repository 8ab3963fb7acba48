"""Deterministic synthetic pages generator — the simulator analog of the
reference's ``reorgd`` fake chain (/root/reference/cmd/reorgd/main.go:74-169),
made fully deterministic (seeded; mutation schedule is part of the fixture,
not a dice roll — FIXTURES.md §1, §6).

Produces the authoritative ``pages`` table (url, warc_ts, html, text, lang)
with mega-host skew (Zipf page allocation), a seeded link graph (~80%%
same-host, ~20%% cross-host preferential to low host ids, relative and
absolute hrefs, duplicate/fragment/query noise), per-host robots.txt pages,
and ground-truth ``text`` computed with the engine's own ``extract_text``
(the byte-identity contract).

Pages are written host-sharded (``pshard=<hash(host)%%P>/part.parquet``)
so the fetch-sim stage can do partition-local lookups — the layout a real
10^10-URL frontier would use to keep membership/fetch lookups off the
all-to-all path.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .functions.extract import extract_text
from .functions.urls import hash64
from . import schemas

_WORDS = (
    "the of and to in is for with on as data web crawl page link engine ray arrow "
    "stream batch shard host frontier queue token robot index fetch parse text "
    "model train corpus dedup filter hash block chain state round commit order "
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambada mu nu xi"
).split()

SIZES = {
    "tiny": dict(hosts=20, pages=2_000, seeds=5),
    "small": dict(hosts=200, pages=60_000, seeds=20),
    "bench": dict(hosts=2_000, pages=600_000, seeds=100),
    "bench4": dict(hosts=8_000, pages=2_400_000, seeds=400),
    "bench10": dict(hosts=32_000, pages=10_000_000, seeds=1_600),
}

N_PAGE_SHARDS = 32  # fixed physical layout of the pages store


def host_name(h: int) -> str:
    return f"host-{h:04d}.example"


def _zipf_counts(hosts: int, pages: int, s: float = 1.1) -> np.ndarray:
    w = (np.arange(1, hosts + 1, dtype=np.float64)) ** (-s)
    w /= w.sum()
    counts = np.floor(w * pages).astype(np.int64)
    counts = np.maximum(counts, 1)
    # largest-remainder top-up to hit exactly `pages`
    deficit = pages - counts.sum()
    if deficit > 0:
        frac = w * pages - np.floor(w * pages)
        order = np.argsort(-frac, kind="stable")
        counts[order[: int(deficit)]] += 1
    elif deficit < 0:
        order = np.argsort(counts, kind="stable")[::-1]
        i = 0
        while deficit < 0:
            if counts[order[i % hosts]] > 1:
                counts[order[i % hosts]] -= 1
                deficit += 1
            i += 1
    return counts


def _gen_chunk(
    start: int,
    end: int,
    host_of_page: "np.ndarray",
    pages_of_host: list,
    hw_cum: "np.ndarray",
    n_links: "np.ndarray",
    seed: int,
    dead_link_rate: float,
) -> tuple[list, list]:
    """Generate html+text for pages [start, end). Each page uses its own
    SeedSequence([seed, i]) rng, so output is identical for ANY chunking
    — the property that lets generation run as parallel Ray tasks while
    staying byte-deterministic."""
    W = len(_WORDS)
    htmls: list[bytes] = []
    texts: list[str] = []
    for i in range(start, end):
        rng = np.random.default_rng(np.random.SeedSequence([seed, i]))
        h = int(host_of_page[i])
        title = " ".join(_WORDS[j] for j in rng.integers(0, W, size=4))
        n_par = int(rng.integers(2, 7))
        par_lens = rng.integers(8, 40, size=n_par)
        widx = rng.integers(0, W, size=int(par_lens.sum()))
        paras, pos = [], 0
        for L in par_lens:
            paras.append("<p>" + " ".join(_WORDS[j] for j in widx[pos : pos + int(L)]) + ".</p>")
            pos += int(L)
        anchors = []
        nl = int(n_links[i])
        if nl:
            # bulk random draws for all link decisions of this page
            r_same = rng.random(nl)
            tgt_same = rng.integers(0, len(pages_of_host[h]), size=nl)
            th_cross = np.searchsorted(hw_cum, rng.random(nl))
            r_dead = rng.random(nl)
            dead_ids = rng.integers(0, 1 << 20, size=nl)
            r_rel = rng.random(nl)
            r_noise = rng.random(nl)
            r_dup = rng.random(nl)
            aw = rng.integers(0, W, size=2 * nl)
            cross_pick = rng.random(nl)
            for j in range(nl):
                if r_same[j] < 0.8:
                    tgt = int(pages_of_host[h][tgt_same[j]])
                else:
                    pool = pages_of_host[int(th_cross[j])]
                    tgt = int(pool[int(cross_pick[j] * len(pool))])
                if r_dead[j] < dead_link_rate:
                    href = f"http://{host_name(h)}/gone/{int(dead_ids[j]):06d}"
                elif r_rel[j] < 0.5 and host_of_page[tgt] == h:
                    href = f"/p/{tgt:06d}"  # relative
                else:
                    href = f"http://{host_name(int(host_of_page[tgt]))}/p/{tgt:06d}"
                # canonicalization noise: fragments, unsorted query, duplicates
                if r_noise[j] < 0.1:
                    href += "#frag"
                elif r_noise[j] < 0.13:
                    href += "?b=2&a=1"
                anchors.append(f'<p><a href="{href}">{_WORDS[aw[2 * j]]} {_WORDS[aw[2 * j + 1]]}</a></p>')
                if r_dup[j] < 0.05:
                    anchors.append(f'<p><a href="{href}">dup</a></p>')
        html = (
            f"<html><head><title>{title}</title>"
            f"<script>var x = {i};</script><style>p {{margin: 0}}</style></head>"
            f"<body><div>nav | home | about</div>"
            + "".join(paras)
            + "".join(anchors)
            + "<div>footer &amp; copyright</div></body></html>"
        ).encode()
        htmls.append(html)
        texts.append(extract_text(html))
    return htmls, texts


def generate_pages(
    size: str = "tiny",
    *,
    hosts: int | None = None,
    pages: int | None = None,
    n_seeds: int | None = None,
    seed: int = 42,
    dead_link_rate: float = 0.01,
    parallel_threshold: int = 50_000,
):
    """Build the synthetic web. Returns (pa.Table pages, list[str] seed_urls).

    Deterministic regardless of execution mode: per-page seeded rngs mean
    the serial path and the Ray-parallel path (used automatically above
    ``parallel_threshold`` pages when Ray is initialised) produce
    byte-identical tables."""
    cfg = SIZES[size] if size in SIZES else SIZES["tiny"]
    H = hosts or cfg["hosts"]
    P = pages or cfg["pages"]
    K = n_seeds or cfg["seeds"]
    rng = np.random.default_rng(seed)

    counts = _zipf_counts(H, P)
    host_of_page = np.repeat(np.arange(H), counts)  # global page index -> host
    # page urls, globally numbered (FIXTURES.md §1)
    urls = [f"http://{host_name(int(h))}/p/{i:06d}" for i, h in enumerate(host_of_page)]
    # pages of each host, for same-host link sampling. host_of_page is
    # np.repeat over ascending host ids, so each host's pages are one
    # contiguous index range: split is O(P) and yields arrays identical
    # to the former per-host flatnonzero scan (which was O(H*P) — hours
    # at the 10M-page bench10 size).
    pages_of_host = np.split(np.arange(P, dtype=np.int64), np.cumsum(counts)[:-1])

    n_links = rng.integers(0, 41, size=P)
    # cross-host preferential to low host ids: weights ~ 1/(h+1)
    hw = 1.0 / (np.arange(H) + 1.0)
    hw /= hw.sum()
    hw_cum = np.cumsum(hw)
    langs = ["en", "de", "fr", "es", "zh"]

    use_ray = False
    if P >= parallel_threshold:
        try:
            import ray as _ray

            use_ray = _ray.is_initialized()
        except Exception:
            use_ray = False
    if use_ray:
        import ray as _ray

        chunk = 20_000
        gen_task = _ray.remote(num_cpus=1)(_gen_chunk)
        hop_ref = _ray.put(host_of_page)
        poh_ref = _ray.put(pages_of_host)
        nl_ref = _ray.put(n_links)
        refs = [
            gen_task.remote(s, min(s + chunk, P), hop_ref, poh_ref, hw_cum, nl_ref, seed, dead_link_rate)
            for s in range(0, P, chunk)
        ]
        parts = _ray.get(refs)
        htmls = [h for part in parts for h in part[0]]
        texts = [t for part in parts for t in part[1]]
    else:
        htmls, texts = _gen_chunk(0, P, host_of_page, pages_of_host, hw_cum, n_links, seed, dead_link_rate)

    # robots pages: ~10% of hosts disallow the /p/00 prefix (FIXTURES.md §1)
    robots_urls, robots_html, robots_text, robots_host = [], [], [], []
    for h in range(H):
        if h % 10 == 3:
            body = "User-agent: *\nDisallow: /p/00\n"
        else:
            body = "User-agent: *\nDisallow:\n"
        robots_urls.append(f"http://{host_name(h)}/robots.txt")
        rb = body.encode()
        robots_html.append(rb)
        robots_text.append(body)
        robots_host.append(h)

    all_urls = urls + robots_urls
    all_html = htmls + robots_html
    all_text = texts + robots_text
    all_host = np.concatenate([host_of_page, np.asarray(robots_host)])
    base_us = np.int64(1_767_225_600_000_000)  # 2026-01-01T00:00:00Z in µs
    ts = base_us + np.arange(len(all_urls), dtype=np.int64) * 1_000_000
    lang_col = [langs[int(h) % 5] for h in all_host]

    table = pa.table(
        {
            "url": pa.array(all_urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us", tz="UTC")),
            "html": pa.array(all_html, pa.binary()),
            "text": pa.array(all_text, pa.string()),
            "lang": pa.array(lang_col, pa.string()),
        },
        schema=schemas.PAGES,
    )
    seeds = [urls[int(pages_of_host[h][0])] for h in range(min(K, H))]
    return table, seeds


def write_pages_store(table: pa.Table, out_dir: str, n_shards: int = N_PAGE_SHARDS) -> None:
    """Write the pages table host-sharded: ``out_dir/pshard=S/part.parquet``.

    Shard key = hash64(host) % n_shards — the same partitioning function
    the engine uses, so fetch lookups are partition-local.
    """
    hosts = [u.split("/")[2] for u in table.column("url").to_pylist()]
    shard = (hash64(hosts) % np.uint64(n_shards)).astype(np.int64)
    tbl = table.append_column("pshard", pa.array(shard, pa.int64()))
    os.makedirs(out_dir, exist_ok=True)
    for s in range(n_shards):
        mask = pa.array(shard == s)
        part = tbl.filter(mask).drop_columns(["pshard"])
        d = os.path.join(out_dir, f"pshard={s}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(part, os.path.join(d, "part.parquet"))


def apply_mutations(pages_dir: str, mutate_urls: list[str], seed: int = 1042) -> dict[str, bytes]:
    """Mutation mode (reorg analog, FIXTURES.md §6): rewrite the html/text
    of the listed urls in place in the pages store, deterministically.
    Returns {url: new_html} for test assertions."""
    rng = np.random.default_rng(seed)
    targets = set(mutate_urls)
    changed: dict[str, bytes] = {}
    for shard_dir in sorted(os.listdir(pages_dir)):
        path = os.path.join(pages_dir, shard_dir, "part.parquet")
        if not os.path.exists(path):
            continue
        t = pq.read_table(path)
        urls = t.column("url").to_pylist()
        if not targets.intersection(urls):
            continue
        htmls = t.column("html").to_pylist()
        texts = t.column("text").to_pylist()
        for i, u in enumerate(urls):
            if u in targets:
                extra = " ".join(rng.choice(_WORDS, size=8))
                new_html = htmls[i].replace(b"</body>", f"<p>MUTATED {extra}.</p></body>".encode())
                htmls[i] = new_html
                texts[i] = extract_text(new_html)
                changed[u] = new_html
        t2 = pa.table(
            {
                "url": t.column("url"),
                "warc_ts": t.column("warc_ts"),
                "html": pa.array(htmls, pa.binary()),
                "text": pa.array(texts, pa.string()),
                "lang": t.column("lang"),
            },
            schema=schemas.PAGES,
        )
        tmp = path + ".tmp"
        pq.write_table(t2, tmp)
        os.replace(tmp, path)
    return changed


def _gen_chunk_sharded(
    start: int,
    end: int,
    host_of_page,
    pages_of_host,
    hw_cum,
    n_links,
    seed: int,
    dead_link_rate: float,
    n_shards: int,
    base_us: int,
):
    """Generate pages [start, end) and split them into per-pshard piece
    tables, each ``ray.put`` into the object store. Returns a list of
    ``n_shards`` ObjectRefs — so a downstream shard writer pulls ONLY its
    own shard's pieces, never the whole chunk. This is what lets the 10M-
    page fixture generate without ever assembling the corpus on one node."""
    import ray as _ray

    htmls, texts = _gen_chunk(start, end, host_of_page, pages_of_host, hw_cum, n_links, seed, dead_link_rate)
    langs = ["en", "de", "fr", "es", "zh"]
    hosts_i = host_of_page[start:end]
    urls = [f"http://{host_name(int(h))}/p/{i:06d}" for i, h in zip(range(start, end), hosts_i)]
    host_names = [host_name(int(h)) for h in hosts_i]
    shard = (hash64(host_names) % np.uint64(n_shards)).astype(np.int64)
    ts = base_us + np.arange(start, end, dtype=np.int64) * 1_000_000
    tbl = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us", tz="UTC")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array([langs[int(h) % 5] for h in hosts_i], pa.string()),
        },
        schema=schemas.PAGES,
    )
    return [_ray.put(tbl.filter(pa.array(shard == s))) for s in range(n_shards)]


def _write_shard(out_dir: str, s: int, piece_refs: list, robots_piece) -> int:
    """Concat one pshard's pieces (chunk order, robots last — the exact row
    order of the serial ``write_pages_store`` path) and write part.parquet."""
    import ray as _ray

    pieces = _ray.get(list(piece_refs)) + [robots_piece]
    tbl = pa.concat_tables([p for p in pieces if p.num_rows > 0]).combine_chunks()
    d = os.path.join(out_dir, f"pshard={s}")
    os.makedirs(d, exist_ok=True)
    pq.write_table(tbl, os.path.join(d, "part.parquet"))
    return tbl.num_rows


def generate_store_distributed(
    size: str,
    out_dir: str,
    *,
    seed: int = 42,
    dead_link_rate: float = 0.01,
    n_shards: int = N_PAGE_SHARDS,
    chunk: int = 20_000,
) -> list:
    """Generate + write the host-sharded pages store WITHOUT materializing
    the corpus on the driver: chunk tasks put per-pshard pieces into the
    object store; one writer task per pshard concats its pieces and writes
    part.parquet. Output tables are identical to the serial
    ``generate_pages`` + ``write_pages_store`` path (pinned by
    test_conformance). Returns the seed url list."""
    import ray as _ray

    cfg = SIZES[size]
    H, P, K = cfg["hosts"], cfg["pages"], cfg["seeds"]
    rng = np.random.default_rng(seed)
    counts = _zipf_counts(H, P)
    host_of_page = np.repeat(np.arange(H), counts)
    pages_of_host = np.split(np.arange(P, dtype=np.int64), np.cumsum(counts)[:-1])
    n_links = rng.integers(0, 41, size=P)
    hw = 1.0 / (np.arange(H) + 1.0)
    hw /= hw.sum()
    hw_cum = np.cumsum(hw)
    base_us = np.int64(1_767_225_600_000_000)

    # robots pages ride behind all content pages, exactly as in generate_pages
    langs = ["en", "de", "fr", "es", "zh"]
    robots_rows = {
        "url": [], "warc_ts": [], "html": [], "text": [], "lang": [],
    }
    robots_hosts = []
    for h in range(H):
        body = "User-agent: *\nDisallow: /p/00\n" if h % 10 == 3 else "User-agent: *\nDisallow:\n"
        robots_rows["url"].append(f"http://{host_name(h)}/robots.txt")
        robots_rows["warc_ts"].append(int(base_us) + (P + h) * 1_000_000)
        robots_rows["html"].append(body.encode())
        robots_rows["text"].append(body)
        robots_rows["lang"].append(langs[h % 5])
        robots_hosts.append(host_name(h))
    robots_tbl = pa.table(
        {
            "url": pa.array(robots_rows["url"], pa.string()),
            "warc_ts": pa.array(np.asarray(robots_rows["warc_ts"], np.int64), pa.timestamp("us", tz="UTC")),
            "html": pa.array(robots_rows["html"], pa.binary()),
            "text": pa.array(robots_rows["text"], pa.string()),
            "lang": pa.array(robots_rows["lang"], pa.string()),
        },
        schema=schemas.PAGES,
    )
    robots_shard = (hash64(robots_hosts) % np.uint64(n_shards)).astype(np.int64)

    gen_task = _ray.remote(num_cpus=1)(_gen_chunk_sharded)
    write_task = _ray.remote(num_cpus=1)(_write_shard)
    hop_ref = _ray.put(host_of_page)
    poh_ref = _ray.put(pages_of_host)
    nl_ref = _ray.put(n_links)
    chunk_refs = [
        gen_task.remote(s, min(s + chunk, P), hop_ref, poh_ref, hw_cum, nl_ref, seed, dead_link_rate, n_shards, int(base_us))
        for s in range(0, P, chunk)
    ]
    # chunk_refs[k] resolves to a list of n_shards piece ObjectRefs
    piece_lists = _ray.get(chunk_refs)
    os.makedirs(out_dir, exist_ok=True)
    writes = [
        write_task.remote(
            out_dir, s, [pl[s] for pl in piece_lists], robots_tbl.filter(pa.array(robots_shard == s))
        )
        for s in range(n_shards)
    ]
    total = sum(_ray.get(writes))
    assert total == P + H, f"distributed store wrote {total} rows, expected {P + H}"
    first_page = np.concatenate([[0], np.cumsum(counts)[:-1]])
    return [f"http://{host_name(h)}/p/{int(first_page[h]):06d}" for h in range(min(K, H))]


GEN_VERSION = 3  # bump to invalidate cached fixtures when generation rules change

# sizes at/above this page count use the distributed store writer in
# ensure_fixture (driver never holds the corpus)
_DISTRIBUTED_GEN_THRESHOLD = 1_000_000


def ensure_fixture(size: str, root: str = "/tmp/blockspider_ray_fixtures", seed: int = 42):
    """Generate-once cache: returns (pages_dir, seeds list). Deterministic,
    so concurrent tests and bench runs can share it."""
    out = os.path.join(root, f"{size}-seed{seed}-v{GEN_VERSION}")
    marker = os.path.join(out, "_COMPLETE")
    seeds_path = os.path.join(out, "seeds.txt")
    if not os.path.exists(marker):
        use_dist = False
        if SIZES.get(size, {}).get("pages", 0) >= _DISTRIBUTED_GEN_THRESHOLD:
            try:
                import ray as _ray

                use_dist = _ray.is_initialized()
            except Exception:
                use_dist = False
        os.makedirs(out, exist_ok=True)
        if use_dist:
            seeds = generate_store_distributed(size, os.path.join(out, "pages"), seed=seed)
        else:
            table, seeds = generate_pages(size, seed=seed)
            write_pages_store(table, os.path.join(out, "pages"))
        with open(seeds_path, "w") as f:
            f.write("\n".join(seeds))
        with open(marker, "w") as f:
            f.write("ok")
    with open(seeds_path) as f:
        seeds = [ln.strip() for ln in f if ln.strip()]
    return os.path.join(out, "pages"), seeds
