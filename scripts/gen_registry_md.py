"""Generate REGISTRY.md — the committed name → coverage → check-kind table
SURVEY §8.4 promises (VERDICT r4 item 8). Re-run after registry changes:

    python scripts/gen_registry_md.py > REGISTRY.md
"""

from __future__ import annotations

from server2_vector_search_server_spark.plans import load_registry


def main() -> None:
    reg = load_registry()
    n_oracle = sum(1 for q in reg.values() if q.oracle is not None)
    print("# Registered query inventory (generated)")
    print()
    print(f"{len(reg)} queries; {n_oracle} DuckDB-hash-checked, "
          f"{len(reg) - n_oracle} rows-only. Regenerate with "
          "`python scripts/gen_registry_md.py > REGISTRY.md`.")
    print()
    print("| query | SURVEY coverage | check |")
    print("|---|---|---|")
    for name in sorted(reg):
        q = reg[name]
        kind = "hash" if q.oracle is not None else "rows-only"
        survey = q.survey_ref.replace("|", "\\|")
        print(f"| `{name}` | {survey} | {kind} |")


if __name__ == "__main__":
    main()
