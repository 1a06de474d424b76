"""Record live LLM completions into the committed cassettes that
tests/test_llm_cassettes.py replays (tests/fixtures/llm_cassettes/).

Usage (needs litellm + a provider key in the environment; never run in
CI — CI replays the committed recordings):

    python tools/record_llm_cassettes.py [model]

For each prompt contract (transform / key_infer / gen_rows) this sends
the SAME prompt the replay test reconstructs, captures the raw litellm
response, and rewrites the cassette with the recorded payload plus the
`prompt_must_contain` anchors the replay transport asserts on. Review
the diff before committing: the recorded SQL/JSON must still satisfy
the downstream validators (the replay tests check exactly that).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CASSETTE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "fixtures",
    "llm_cassettes",
)

# (cassette name, prompt builder, anchors) — prompts mirror the replay tests
CONTRACTS = [
    (
        "transform",
        lambda llm_mod: llm_mod.TRANSFORM_PROMPT.format(
            summary=(
                "rows=3, columns: title: string, rating: double; "
                "first row: {'title': 'Alpha', 'rating': 8.1}"
            ),
            query="top 2 movies by rating",
        ),
        ["Spark SQL", "top 2 movies by rating"],
    ),
    (
        "key_infer",
        lambda llm_mod: llm_mod.KEY_INFER_PROMPT.format(
            template="http://api.example.com/movies/{movie}",
            columns=json.dumps(
                {"film_title": {"type": "string", "samples": ["Alpha", "Beta"]}}
            ),
        ),
        ["URL template", "{movie}", "film_title"],
    ),
    (
        "gen_rows",
        lambda llm_mod: llm_mod.GEN_ROWS_PROMPT.format(
            query="the G7 countries and their capitals"
        ),
        ["tabular data", "G7 countries"],
    ),
]


def main() -> None:
    model = sys.argv[1] if len(sys.argv) > 1 else "gpt-4o-mini"
    import litellm

    import magictables_spark.llm as llm_mod

    for name, build_prompt, anchors in CONTRACTS:
        prompt = build_prompt(llm_mod)
        resp = litellm.completion(
            model=model, messages=[{"role": "user", "content": prompt}]
        )
        payload = {
            "contract": name,
            "calls": [
                {
                    "model": model,
                    "prompt_must_contain": anchors,
                    "response": json.loads(resp.model_dump_json()),
                }
            ],
        }
        path = os.path.join(CASSETTE_DIR, f"{name}.json")
        with open(path, "w") as f:
            json.dump(payload, f, indent=2)
        print(f"recorded {path}")


if __name__ == "__main__":
    main()
