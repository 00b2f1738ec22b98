.PHONY: test bench native clean

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

native:
	$(MAKE) -C native

clean:
	$(MAKE) -C native clean
	rm -rf build dist *.egg-info .pytest_cache
