"""Record the real-NER-model parity fixture (run where torch+flair exist).

The engine's ORG extractor (ccer/operators/entities.py) ships a
deterministic heuristic stand-in because this build environment has no
torch; the reference runs a Flair SequenceTagger
(query_db/analysis/entity_extraction.py:55-68). This script arms the
parity harness: it loads the reference's model, runs it over the fixed
input set in tests/fixtures/ner_org_flair.json, and writes the ORG spans
back into the fixture with status="recorded". From then on
tests/test_workflow.py::test_flair_model_parity stops skipping and
asserts the pluggable-factory path reproduces these exact spans.

Usage:  python jobs/record_ner_fixture.py  [--model flair/ner-english-large]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "ner_org_flair.json",
)


def flair_org_factory(model_name: str):
    """Zero-arg-callable builder for the pluggable factory plug point
    (ccer.operators.entities._get_model): returns an object with
    predict_batch(list[str]) -> list[list[str]] backed by Flair."""
    from flair.data import Sentence
    from flair.models import SequenceTagger

    class _FlairOrgModel:
        def __init__(self):
            self.tagger = SequenceTagger.load(model_name)

        def predict_batch(self, texts):
            sentences = [Sentence(t or " ") for t in texts]
            self.tagger.predict(sentences, mini_batch_size=32)
            return [
                [span.text for span in s.get_spans("ner") if span.tag == "ORG"]
                for s in sentences
            ]

    return _FlairOrgModel


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None, help="Flair model name (default: fixture's)")
    args = ap.parse_args()

    with open(FIXTURE) as f:
        fx = json.load(f)
    model_name = args.model or fx["model"]
    try:
        model = flair_org_factory(model_name)()
    except ImportError as e:
        print(f"flair/torch not installed: {e}", file=sys.stderr)
        return 1

    import flair

    fx["expected_orgs"] = model.predict_batch(fx["inputs"])
    fx["status"] = "recorded"
    fx["model"] = model_name
    fx["recorded_with"] = f"flair=={flair.__version__}"
    with open(FIXTURE, "w") as f:
        json.dump(fx, f, indent=2, ensure_ascii=False)
        f.write("\n")
    print(f"recorded {sum(len(o) for o in fx['expected_orgs'])} spans -> {FIXTURE}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
