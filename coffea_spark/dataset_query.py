"""Dataset discovery/selection workflow over a local catalog.

The reference ships an interactive dataset-discovery workflow
(``dataset_tools/dataset_query.py:109-889`` ``DataDiscoveryCLI``) whose
storage backend is the Rucio/DAS grid catalog. The GRID NETWORK layer
is out of scope for this engine (no grid services are assumed — see
COVERAGE.md §2.1); what this module reimplements is everything above
it: wildcard dataset queries, index/range selection with attached
metadata, per-file replica choice across sites under
allowlist/blocklist/regex site filters, and fileset assembly feeding
``dataset_tools.preprocess``. The backend is a pluggable CATALOG — a
dict or JSON file mapping dataset name -> files -> site replicas — so
the same workflow runs against a warehouse manifest, a lab NFS index,
or any catalog dump.

Unlike the reference CLI, every step is deterministic and
non-interactive (no prompts, no ``random.shuffle``): ``round-robin``
rotates sites by file index, ``first`` takes the most-available site —
reproducible fileset builds are a property worth keeping in a batch
engine.

Catalog shape::

    {
      "dataset_name": {
        "files": [
          {"lfn": "logical/name.root",
           "replicas": {"SITE_A": "/path/at/a.root",
                        "SITE_B": "/path/at/b.root"}},
          ...
        ],
        "metadata": {...}            # optional
      },
      ...
    }
"""

from __future__ import annotations

import fnmatch
import json
import re


def parse_selection(selection: str, n: int) -> list[int]:
    """1-based index/range selection string -> 0-based indices
    (reference ``get_indices_query``): ``"all"``, ``"1 4 6-10"``."""
    if selection.strip().lower() == "all":
        return list(range(n))
    out: list[int] = []
    for tok in selection.split():
        m = re.fullmatch(r"(\d+)-(\d+)", tok)
        if m:
            lo, hi = int(m.group(1)), int(m.group(2))
            if lo < 1 or hi > n or lo > hi:
                raise ValueError(f"range {tok!r} outside 1..{n}")
            out.extend(range(lo - 1, hi))
        elif tok.isdigit():
            i = int(tok)
            if not 1 <= i <= n:
                raise ValueError(f"index {tok!r} outside 1..{n}")
            out.append(i - 1)
        else:
            raise ValueError(f"bad selection token {tok!r}")
    return out


class LocalCatalog:
    """Catalog backend: the non-network stand-in for rucio_utils."""

    def __init__(self, catalog: dict | str):
        if isinstance(catalog, str):
            with open(catalog) as f:
                catalog = json.load(f)
        self.catalog = catalog

    def query_dataset(self, pattern: str) -> list[str]:
        """Datasets matching a DAS-style ``*`` wildcard pattern, sorted."""
        return sorted(fnmatch.filter(self.catalog.keys(), pattern))

    def dataset_metadata(self, dataset: str) -> dict:
        return dict(self.catalog[dataset].get("metadata", {}))

    def get_dataset_files_replicas(
        self,
        dataset: str,
        allowlist_sites: list[str] | None = None,
        blocklist_sites: list[str] | None = None,
        regex_sites: str | None = None,
    ) -> tuple[list[list[str]], list[list[str]], dict[str, int]]:
        """Per-file (replica paths, replica sites) after site filters,
        plus per-site file counts — the rucio_utils 'full'-mode shape."""
        files = self.catalog[dataset]["files"]
        outfiles, outsites = [], []
        site_counts: dict[str, int] = {}
        for f in files:
            paths, sites = [], []
            for site, path in sorted(f["replicas"].items()):
                if allowlist_sites and site not in allowlist_sites:
                    continue
                if blocklist_sites and site in blocklist_sites:
                    continue
                if regex_sites and not re.search(regex_sites, site):
                    continue
                paths.append(path)
                sites.append(site)
                site_counts[site] = site_counts.get(site, 0) + 1
            if not paths:
                raise ValueError(
                    f"{dataset}: no replica of {f.get('lfn', '?')} survives "
                    f"the site filters (have {sorted(f['replicas'])})"
                )
            outfiles.append(paths)
            outsites.append(sites)
        return outfiles, outsites, site_counts


class DataDiscovery:
    """Programmatic, deterministic counterpart of the reference's
    DataDiscoveryCLI query -> select -> replicas -> preprocess flow."""

    def __init__(self, catalog):
        # backend seam, mirroring the reference's injectable client
        # (rucio_utils.get_dataset_files_replicas(client=...),
        # dataset_query.py grid backends): ANY object implementing
        # query_dataset / dataset_metadata / get_dataset_files_replicas
        # plugs in — a LocalCatalog (dict/JSON manifest), or a grid
        # transport wrapper where Rucio/DAS is reachable. A dict/path
        # coerces to LocalCatalog.
        self.catalog = (
            catalog
            if hasattr(catalog, "query_dataset")
            else LocalCatalog(catalog)
        )
        self.last_query: str | None = None
        self.last_query_list: list[str] = []
        self.selected_datasets: list[str] = []
        self.selected_datasets_metadata: list[dict] = []
        self.sites_allowlist: list[str] | None = None
        self.sites_blocklist: list[str] | None = None
        self.sites_regex: str | None = None
        self.replica_results: dict[str, dict] = {}

    # -- query / select ------------------------------------------------
    def do_query(self, query: str) -> list[str]:
        self.last_query = query
        self.last_query_list = self.catalog.query_dataset(query)
        return list(self.last_query_list)

    def do_select(self, selection: str = "all", metadata: dict | None = None):
        if not self.last_query_list:
            raise RuntimeError("query first: no results to select from")
        for i in parse_selection(selection, len(self.last_query_list)):
            name = self.last_query_list[i]
            if name in self.selected_datasets:
                continue
            self.selected_datasets.append(name)
            meta = self.catalog.dataset_metadata(name)
            meta.update(metadata or {})
            self.selected_datasets_metadata.append(meta)
        return list(self.selected_datasets)

    # -- site filters --------------------------------------------------
    def do_allowlist_sites(self, sites: list[str]):
        self.sites_allowlist = list(sites)

    def do_blocklist_sites(self, sites: list[str]):
        self.sites_blocklist = list(sites)

    def do_regex_sites(self, regex: str):
        self.sites_regex = regex

    # -- replicas ------------------------------------------------------
    def do_replicas(self, mode: str = "round-robin", selection: str = "all",
                    choose_sites: list[str] | None = None):
        """Pick ONE physical path per file for the selected datasets.

        - ``round-robin``: rotate deterministically through each file's
          available sites by file index (the reference randomizes;
          determinism is deliberate here)
        - ``first``: the most-available site overall, falling back per
          file to its first surviving replica
        - ``choose``: restrict to ``choose_sites`` (in preference order)
        """
        if mode not in ("round-robin", "first", "choose"):
            raise ValueError(f"unknown replica mode {mode!r}")
        if mode == "choose" and not choose_sites:
            raise ValueError("mode='choose' needs choose_sites=[...]")
        idxs = parse_selection(selection, len(self.selected_datasets))
        for i in idxs:
            dataset = self.selected_datasets[i]
            outfiles, outsites, site_counts = (
                self.catalog.get_dataset_files_replicas(
                    dataset,
                    allowlist_sites=self.sites_allowlist,
                    blocklist_sites=self.sites_blocklist,
                    regex_sites=self.sites_regex,
                )
            )
            ranked = sorted(site_counts, key=lambda s: (-site_counts[s], s))
            picked: list[str] = []
            for fi, (paths, sites) in enumerate(zip(outfiles, outsites)):
                if mode == "round-robin":
                    picked.append(paths[fi % len(paths)])
                elif mode == "first":
                    by_rank = [s for s in ranked if s in sites]
                    picked.append(paths[sites.index(by_rank[0])])
                else:  # choose
                    want = [s for s in choose_sites if s in sites]
                    if not want:
                        raise ValueError(
                            f"{dataset} file {fi}: none of {choose_sites} "
                            f"hold a replica (have {sites})"
                        )
                    picked.append(paths[sites.index(want[0])])
            self.replica_results[dataset] = {
                "files": picked,
                "metadata": self.selected_datasets_metadata[i],
                "site_counts": site_counts,
            }
        return self.replica_results

    # -- output --------------------------------------------------------
    def as_dict(self, tree: str = "Events") -> dict:
        """The uproot-style fileset (files -> treename + metadata) the
        rest of dataset_tools consumes."""
        return {
            ds: {
                "files": {p: tree for p in info["files"]},
                "metadata": dict(info["metadata"]),
            }
            for ds, info in self.replica_results.items()
        }

    def do_preprocess(self, spark=None, tree: str = "Events", **kwargs):
        """Fileset -> per-file num_entries/steps/uuid via the engine's
        distributed ``dataset_tools.preprocess``."""
        from coffea_spark.dataset_tools import preprocess

        return preprocess(self.as_dict(tree=tree), spark=spark, **kwargs)

    def load_dataset_definition(
        self,
        dataset_definition: dict[str, dict],
        replicas_strategy: str = "round-robin",
        choose_sites: list[str] | None = None,
    ) -> dict:
        """Batch form (reference :809-889): one query+select per entry
        (attaching the given metadata), then replica resolution for
        everything; returns the fileset dict."""
        for query, meta in dataset_definition.items():
            self.do_query(query)
            self.do_select("all", metadata=meta)
        self.do_replicas(mode=replicas_strategy, selection="all",
                         choose_sites=choose_sites)
        return self.as_dict()
