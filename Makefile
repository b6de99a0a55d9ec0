# Top-level dev entry points (reference build-system row: CMakeLists.txt).
.PHONY: test bench native install clean

native:
	$(MAKE) -C native

install:
	pip install -e .

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

clean:
	$(MAKE) -C native clean
