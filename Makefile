.PHONY: all native test smoke bench clean

all: native

native:
	$(MAKE) -C native

test: native
	python -m pytest tests/ -q

smoke: native
	python bench.py --smoke

bench: native
	python bench.py

clean:
	$(MAKE) -C native clean
