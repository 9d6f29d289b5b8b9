"""Task guidance — structured recipes for agent-driven workflows.

Reference parity: ``odibi_mcp/tools/guidance.py`` (TASK_GUIDANCE:
per-task description + parameter questions with hints/defaults/
``discover_with`` pointers + the next tool and a call template), so an
agent on the MCP gateway asks the right questions instead of guessing.
Task types and tool names here map onto THIS engine's dispatcher
actions and YAML surface; a pytest cross-checks every referenced
action against the live Dispatcher registry so guidance cannot drift.
"""

from __future__ import annotations

from typing import Any

TASK_GUIDANCE: dict[str, dict[str, Any]] = {
    "profile_data": {
        "description": "Inspect schema, stats, and sample rows of a dataset",
        "questions": [
            {"param": "base_path", "question": "Which folder holds the data?",
             "hint": "discover lists every dataset under a base path",
             "discover_with": "discover", "required": True},
            {"param": "dataset", "question": "Which file or directory to profile?",
             "hint": "Examples: events.parquet, data/customers.csv",
             "required": True},
        ],
        "next_tool": "profile_source",
        "call_template": "profile_source(dataset={dataset})",
    },
    "build_pipeline": {
        "description": "Generate a starter pipeline YAML and validate it",
        "questions": [
            {"param": "name", "question": "Pipeline name?",
             "hint": "lowercase_with_underscores", "required": True},
            {"param": "source_path", "question": "Where does the data come from?",
             "discover_with": "discover", "required": True},
            {"param": "target_path", "question": "Where should results land?",
             "required": True},
        ],
        "next_tool": "scaffold_pipeline",
        "call_template": (
            "scaffold_pipeline(name={name}, source_path={source_path}, "
            "target_path={target_path})"
        ),
    },
    "validate_pipeline": {
        "description": "Check a pipeline YAML parses, plan its layers, see lineage",
        "questions": [
            {"param": "path", "question": "Path to the pipeline YAML?",
             "required": True},
            {"param": "env", "question": "Environment overlay to apply?",
             "hint": "matches the YAML's environments: block",
             "default": None, "required": False},
        ],
        "next_tool": "validate_yaml",
        "call_template": "validate_yaml(path={path}, env={env})",
    },
    "run_pipeline": {
        "description": "Execute a pipeline end-to-end (EXECUTION grant needed)",
        "questions": [
            {"param": "path", "question": "Path to the pipeline YAML?",
             "discover_with": "validate_yaml", "required": True},
            {"param": "env", "question": "Environment overlay?",
             "default": None, "required": False},
        ],
        "next_tool": "run_pipeline",
        "call_template": "run_pipeline(path={path}, env={env})",
    },
    "curate_training_data": {
        "description": (
            "LLM corpus curation: scrub -> quality stats -> dedup -> "
            "decontaminate -> sample -> chunk/pack -> shards"
        ),
        "questions": [
            {"param": "corpus", "question": "Where is the document corpus?",
             "discover_with": "discover", "required": True},
            {"param": "benchmark", "question": "Benchmark/eval set to decontaminate against?",
             "hint": "exact n-gram pass: decontaminate; fuzzy near-dup "
                     "pass: neardup_decontaminate", "required": False},
            {"param": "layout", "question": "Final training layout?",
             "options": [
                 {"label": "token-balanced jsonl shards", "value": "jsonl"},
                 {"label": "WebDataset tar shards", "value": "webdataset"},
             ],
             "default": "webdataset", "required": False},
        ],
        "next_tool": "get_doc",
        "call_template": "get_doc(name=README.md)",
        "example": "examples/training_data_prep.yaml",
    },
    "dedup_corpus": {
        "description": "Pick the right dedup family for the corpus",
        "questions": [
            {"param": "kind", "question": "What counts as a duplicate?",
             "options": [
                 {"label": "byte-identical text", "value": "dedup_exact"},
                 {"label": "near-identical text (MinHash-LSH)",
                  "value": "dedup_minhash"},
                 {"label": "repeated spans across docs (exact substring)",
                  "value": "duplicate_spans"},
                 {"label": "semantically similar embeddings (SemDeDup)",
                  "value": "semantic_dedup"},
                 {"label": "daily incremental batches",
                  "value": "dedup_incremental"},
             ], "required": True},
        ],
        "next_tool": "explain_transformer",
        "call_template": "explain_transformer(name={kind})",
    },
    "semantic_search": {
        "description": "Similarity search over an embedding column",
        "questions": [
            {"param": "scale", "question": "Corpus size?",
             "options": [
                 {"label": "keyword/lexical (Okapi BM25)",
                  "value": "bm25_score"},
                 {"label": "small (brute-force exact)", "value": "cosine_topk"},
                 {"label": "large (LSH buckets)", "value": "lsh_ann_topk"},
                 {"label": "very large (IVF cells)", "value": "ivf_topk"},
                 {"label": "memory-bound (int8 quantized store)",
                  "value": "quantize_embeddings"},
             ], "required": True},
        ],
        "next_tool": "list_workloads",
        "call_template": "list_workloads()",
    },
    "inspect_runs": {
        "description": "Query the system catalog about past runs",
        "questions": [
            {"param": "root", "question": "Catalog root path?",
             "hint": "the --catalog value runs were recorded with",
             "required": True},
            {"param": "pipeline", "question": "Filter to one pipeline?",
             "default": None, "required": False},
        ],
        "next_tool": "catalog_runs",
        "call_template": "catalog_runs(root={root}, pipeline={pipeline})",
    },
}


def list_task_types() -> dict[str, Any]:
    return {
        "task_types": [
            {"task_type": k, "description": v["description"]}
            for k, v in sorted(TASK_GUIDANCE.items())
        ]
    }


def get_task_guidance(task_type: str) -> dict[str, Any]:
    g = TASK_GUIDANCE.get(task_type)
    if g is None:
        return {
            "error": f"unknown task_type '{task_type}'",
            "task_types": sorted(TASK_GUIDANCE),
        }
    return {"task_type": task_type, **g}
