# Common workflows
.PHONY: test test-fast bench bench-train bench-matrix demo serving export native lint

test:
	python -m pytest tests/ -q

# iteration tier: skips the compile-heavy suites (marked slow in pytest.ini);
# measured wall times for both tiers are in STATUS.md
test-fast:
	python -m pytest tests/ -q -m "not slow"

bench:
	python bench.py

bench-train:
	python bench_train.py

bench-matrix:
	python tools/bench_matrix.py --batches 1,8

demo:
	python examples/demo.py --steps 150

serving:
	python examples/serving_quickstart.py

export:
	python tools/export_model.py --config config2_retinanet_r50_infer \
		--quantize --dtype bfloat16 --out /tmp/r50.sbdx

# rebuild the native libs (AP matcher + fused JPEG decode); utils/native.py
# also builds these on demand at first use
native:
	g++ -O3 -std=c++17 -shared -fPIC -o csrc/libap_matcher.so csrc/ap_matcher.cpp
	g++ -O3 -std=c++17 -shared -fPIC -o csrc/libsbd_image.so csrc/jpeg_decoder.cpp -ljpeg

# wiring check without executing anything heavy
lint:
	python -c "import ast, pathlib; [ast.parse(p.read_text()) for p in pathlib.Path('shape_based_object_detection_tpu').rglob('*.py')]; print('ok')"

bench-loader:  ## input-pipeline throughput (threads vs grain vs memmap cache)
	python tools/bench_loader.py --images 128 --size 512 --batch 16 --workers 8

profile-train:  ## train-step stage breakdown + MFU estimate on the chip
	python tools/profile_train.py --batch 16
