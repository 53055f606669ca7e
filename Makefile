# Common workflows
.PHONY: test bench bench-train demo lint

test:
	python -m pytest tests/ -q

bench:
	python bench.py

bench-train:
	python bench_train.py

demo:
	python examples/demo.py --steps 150

# wiring check without executing anything heavy
lint:
	python -c "import ast, pathlib; [ast.parse(p.read_text()) for p in pathlib.Path('shape_based_object_detection_tpu').rglob('*.py')]; print('ok')"
