# Build/test/docs targets (capability parity with the reference Makefile:5-45
# and setup.py:1-29: the reference ships build/install/release targets; the
# equivalents here drive pyproject.toml).

.PHONY: all install install-dev build test test-fast bench docs examples clean

all: test

install:
	pip install .

install-dev:
	pip install -e . --no-deps --no-build-isolation

build:
	python -m build --wheel --no-isolation 2>/dev/null || pip wheel . --no-deps -w dist/

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
