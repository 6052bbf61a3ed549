# Build/test/docs targets (capability parity with the reference Makefile:5-45)

.PHONY: all test test-fast bench docs examples clean

all: test

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x --ignore=tests/test_examples.py

bench:
	python bench.py

examples:
	@for f in examples/*.py; do echo "== $$f"; python $$f || exit 1; done

docs:
	python docs/generate.py docs/api

clean:
	rm -rf __pycache__ */__pycache__ */*/__pycache__ .pytest_cache docs/api/
